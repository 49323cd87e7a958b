"""Offline pretraining of the feature-compression encoders.

The reference pretrains atom/bond autoencoders and embedding tables offline
and loads the frozen artifacts into models (test_graph_encode_norm.py:130-131
loads `*.state_dict`; test_embed.py:92-103 loads embedding tables + vocab
dict pickles; the AE modules live in mpnn_functions/encoders/ and
test_embed.py:23-46). Here pretraining is a first-class library call + CLI
verb, with pickle-free artifacts (train/checkpoint.py).

  * pretrain_autoencoder      — tanh AE (Linear→tanh→Linear encoder,
    BN→Linear→tanh→Linear→sigmoid decoder) on feature rows, MSE loss.
  * build_vocab / pretrain_embedding_encoder — vocab of distinct raw feature
    vectors → Embedding(vocab, dim, max_norm=1) + BN+Linear decoder trained
    with cross-entropy id reconstruction.
  * embed_graphs — replace graphs' afm/bfm with frozen embedding lookups
    (test_embed.py:78-103 semantics, incl. zeroing bond embeddings at
    non-bonds).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mpnn_tpu.graphs.graph import MolGraph
from mpnn_tpu.ops.autoencoders import (
    embedding_encoder_apply, embedding_encoder_init, embedding_lookup,
    tanh_autoencoder_apply, tanh_autoencoder_init,
)
from mpnn_tpu.train.optim import adam


def _row_matrix(graphs: List[MolGraph], kind: str) -> np.ndarray:
    if kind == "atom":
        return np.vstack([g.afm for g in graphs]).astype(np.float32)
    if kind == "bond":
        rows = np.vstack([g.edge_feats for g in graphs if g.num_edges])
        return rows.astype(np.float32)
    raise ValueError(kind)


def pretrain_autoencoder(graphs: List[MolGraph], kind: str = "atom",
                         mid_dim: Optional[int] = None,
                         e_dim: Optional[int] = None,
                         epochs: int = 200, batch_size: int = 4096,
                         lr: float = 1e-3, seed: int = 317):
    """Train a tanh autoencoder on encoded feature rows. Default dims follow
    the reference ratios (atom 30→15→8, bond 8→4→2 → in→in/2→in/4-ish).
    Returns (params, state, final_loss)."""
    rows = _row_matrix(graphs, kind)
    in_dim = rows.shape[-1]
    mid = mid_dim or max(2, in_dim // 2)
    e = e_dim or max(1, mid // 2)
    key = jax.random.PRNGKey(seed)
    params, state = tanh_autoencoder_init(key, in_dim, mid, e)
    tx = adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, state, opt_state, x):
        def loss_fn(p):
            out, ns = tanh_autoencoder_apply(p, state, x, training=True)
            return ((out - x) ** 2).mean(), ns
        (l, ns), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        return l, optax.apply_updates(params, updates), ns, opt_state

    rs = np.random.RandomState(seed)
    n = rows.shape[0]
    loss = float("nan")
    for _ in range(epochs):
        idx = rs.permutation(n)[:batch_size]
        loss, params, state, opt_state = step(
            params, state, opt_state, jnp.asarray(rows[idx]))
    return params, state, float(loss)


# ---------------------------------------------------------------------------
# embedding encoders (test_embed semantics)
# ---------------------------------------------------------------------------

def build_vocab(graphs: List[MolGraph], kind: str = "atom"
                ) -> Dict[str, int]:
    """Distinct raw feature vectors → ids (the reference's atom_dict /
    bond_dict pickles, keyed by the stringified feature row —
    test_embed.py:79-90)."""
    rows = _row_matrix(graphs, kind)
    vocab: Dict[str, int] = {}
    if kind == "bond":
        # the dense bfm contains all-zero rows for non-bond pairs; the
        # reference's bond_dict covers them (test_embed.py:87 embeds every
        # bfm row before zeroing by adjacency)
        zero = "".join("0" for _ in range(rows.shape[1]))
        vocab[zero] = 0
    for row in rows:
        key = "".join(str(int(v)) for v in row)
        if key not in vocab:
            vocab[key] = len(vocab)
    return vocab


def _ids_for(rows: np.ndarray, vocab: Dict[str, int]) -> np.ndarray:
    return np.asarray(["".join(str(int(v)) for v in row) for row in rows])


def rows_to_ids(rows: np.ndarray, vocab: Dict[str, int]) -> np.ndarray:
    return np.asarray(
        [vocab["".join(str(int(v)) for v in row)] for row in rows], np.int32)


def pretrain_embedding_encoder(graphs: List[MolGraph], kind: str = "atom",
                               dim: Optional[int] = None,
                               epochs: int = 300, lr: float = 1e-2,
                               seed: int = 317):
    """Embedding(vocab, dim, max_norm=1) + BN+Linear decoder, trained to
    reconstruct the id (cross-entropy). Reference dims: atom (58, 4),
    bond (8, 2) — we size the table to the observed vocab and keep the dim
    ratios. Returns (params, state, vocab, final_accuracy)."""
    vocab = build_vocab(graphs, kind)
    v = len(vocab)
    d = dim or (4 if kind == "atom" else 2)
    params, state = embedding_encoder_init(jax.random.PRNGKey(seed), v, d)
    tx = adam(lr)
    opt_state = tx.init(params)
    ids = jnp.arange(v, dtype=jnp.int32)

    @jax.jit
    def step(params, state, opt_state):
        def loss_fn(p):
            logits, ns = embedding_encoder_apply(p, state, ids,
                                                 training=True)
            l = optax.softmax_cross_entropy_with_integer_labels(
                logits, ids).mean()
            return l, (logits, ns)
        (l, (logits, ns)), g = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        return l, logits, optax.apply_updates(params, updates), ns, opt_state

    acc = 0.0
    for _ in range(epochs):
        l, logits, params, state, opt_state = step(params, state, opt_state)
        acc = float((jnp.argmax(logits, -1) == ids).mean())
    return params, state, vocab, acc


def load_pretrained_encoders(params, atom_ckpt: Optional[str] = None,
                             bond_ckpt: Optional[str] = None):
    """Inject pretrained AE encoder weights into an encoded model's params
    (the reference loads `.state_dict` artifacts into atom_encoder /
    bond_encoder, test_graph_encode_norm.py:103-131). Shapes are checked by
    the checkpoint loader; only the encoder halves matter at apply time."""
    from mpnn_tpu.train.checkpoint import load_checkpoint
    mp = params["mpnn"]
    if atom_ckpt is not None:
        assert "atom_encoder" in mp, "model has no atom encoder"
        loaded, _, _, _ = load_checkpoint(atom_ckpt,
                                          params=mp["atom_encoder"])
        mp["atom_encoder"] = loaded
    if bond_ckpt is not None:
        assert "bond_encoder" in mp, "model has no bond encoder"
        loaded, _, _, _ = load_checkpoint(bond_ckpt,
                                          params=mp["bond_encoder"])
        mp["bond_encoder"] = loaded
    return params


def embed_graphs(graphs: List[MolGraph], atom_params, atom_vocab,
                 bond_params, bond_vocab) -> List[MolGraph]:
    """Replace raw afm/bfm with frozen embedding lookups
    (test_embed.py:116-119: bond embeddings zeroed at non-bond positions)."""
    for g in graphs:
        a_ids = rows_to_ids(g.afm, atom_vocab)
        g.afm = np.asarray(embedding_lookup(atom_params,
                                            jnp.asarray(a_ids)), np.float32)
        na = g.num_atoms
        fe = g.bfm.shape[-1]
        b_rows = g.bfm.reshape(-1, fe)
        b_ids = rows_to_ids(b_rows, bond_vocab)
        emb = np.asarray(embedding_lookup(bond_params,
                                          jnp.asarray(b_ids)), np.float32)
        emb = emb * g.adj.reshape(-1, 1)
        g.bfm = emb.reshape(na, na, -1)
        if g.num_edges:
            e_ids = rows_to_ids(g.edge_feats, bond_vocab)
            g.edge_feats = np.asarray(
                embedding_lookup(bond_params, jnp.asarray(e_ids)),
                np.float32)
        g.is_encoded = True
    return graphs
