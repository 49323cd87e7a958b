"""Conformer-ensemble 3D model.

The reference designed but never built its 3D pipeline (thoughts.txt:19-21;
SURVEY.md §1: "the 3D/RNN part was never built; only conformer generation
exists"). This module completes that design TPU-natively:

    molecule → K conformers (chem/conformers.py, energy-ordered)
            → shared MPNN per conformer (edge features ⊕ distance channels)
            → GRU over the conformer sequence (masked for missing conformers)
            → classifier/regressor head

Distance featurization: each bonded pair's 3D distance is appended to the
bond features either raw (`dist_mode='raw'`, the reference's e_dist matrix
as a channel) or as a radial-basis expansion (`dist_mode='rbf'`,
`n_rbf` Gaussian bins over [0, r_cut] — the standard 3D-GNN encoding and
the TPU-friendly default: widens the edge features instead of adding
dynamic structure).

The per-conformer MPNN is the standard configurable MPNN (models/mpnn.py)
vmapped over the conformer axis; running-stat norms are disallowed under
vmap (stateless masked BN is fine), matching the reference's planned basic
composition.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from mpnn_tpu.models.config import MPNNConfig
from mpnn_tpu.models.mpnn import mpnn_apply, mpnn_init
from mpnn_tpu.ops.linear import linear_init, linear_apply
from mpnn_tpu.ops.update import gru_init


@dataclasses.dataclass(frozen=True)
class EnsembleConfig:
    mpnn: MPNNConfig                 # edge_features must include dist chans
    max_conformers: int = 8
    dist_mode: str = "rbf"           # rbf|raw
    n_rbf: int = 8
    r_cut: float = 4.0
    seq_hidden: int = 0              # 0 → use mpnn.effective_output_dim
    n_out: int = 1

    def __post_init__(self):
        if self.mpnn.msg_norm == "bn1d" or self.mpnn.state_norm == "bn1d":
            raise ValueError("ensemble model: running-stat norms are not "
                             "supported under the conformer vmap; use "
                             "'stateless' or 'none'")

    @property
    def dist_channels(self) -> int:
        return self.n_rbf if self.dist_mode == "rbf" else 1

    @property
    def seq_width(self) -> int:
        return self.seq_hidden or self.mpnn.effective_output_dim


def expand_distances(e_dist, adj, cfg: EnsembleConfig):
    """(..., N, N) distances → (..., N, N, C) channels, zeroed off-bond."""
    if cfg.dist_mode == "raw":
        out = e_dist[..., None]
    else:
        centers = jnp.linspace(0.0, cfg.r_cut, cfg.n_rbf)
        gamma = (cfg.n_rbf / cfg.r_cut) ** 2
        out = jnp.exp(-gamma * (e_dist[..., None] - centers) ** 2)
    return out * adj[..., None]


def ensemble_init(key, cfg: EnsembleConfig, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    params, state = {}, {}
    params["mpnn"], state["mpnn"] = mpnn_init(k1, cfg.mpnn, dtype)
    w = cfg.seq_width
    emb = cfg.mpnn.effective_output_dim
    # sequence GRU over conformers (input = conformer embedding)
    params["seq_gru"] = gru_init(k2, w, w, dtype) if w == emb else None
    if params["seq_gru"] is None:
        raise ValueError("seq_hidden must equal the MPNN output width "
                         "(GRU coherence)")
    params["head"] = linear_init(k3, w, cfg.n_out, dtype=dtype)
    return params, state


def _seq_gru_step(p, x, h):
    rzn_i = x @ p["w_ih"] + p["b_ih"]
    rzn_h = h @ p["w_hh"] + p["b_hh"]
    ri, zi, ni = jnp.split(rzn_i, 3, axis=-1)
    rh, zh, nh = jnp.split(rzn_h, 3, axis=-1)
    r = jax.nn.sigmoid(ri + rh)
    z = jax.nn.sigmoid(zi + zh)
    n = jnp.tanh(ni + r * nh)
    return (1.0 - z) * n + z * h


def ensemble_apply(params, state, cfg: EnsembleConfig, batch, *,
                   training: bool = False):
    """batch: afm (B,N,f), bfm (B,N,N,e₀), adj (B,N,N), mask (B,N,1),
    e_dist (B,K,N,N), conf_mask (B,K). Returns (out (B,n_out), state).

    Conformers are assumed energy-ordered (generate_conformers sorts); the
    GRU consumes them lowest-energy-first, skipping masked slots."""
    afm, bfm = batch["afm"], batch["bfm"]
    adj, mask = batch["adj"], batch["mask"]
    e_dist, conf_mask = batch["e_dist"], batch["conf_mask"]
    B, K = conf_mask.shape

    # Zero the distances of masked conformer slots BEFORE featurization:
    # the per-conformer MPNN batch-norms across molecules within a slot, so
    # padded-slot content must be deterministic or it would leak into other
    # molecules' embeddings through the shared statistics.
    e_dist = e_dist * conf_mask[:, :, None, None]
    dist_feats = expand_distances(e_dist, adj[:, None], cfg)  # (B,K,N,N,C)
    bfm_k = jnp.broadcast_to(bfm[:, None],
                             (B, K) + bfm.shape[1:])
    full_bfm = jnp.concatenate([bfm_k, dist_feats], axis=-1)

    def per_conformer(bfm_one):
        out, _ = mpnn_apply(params["mpnn"], state["mpnn"], cfg.mpnn,
                            afm, bfm_one, adj, mask, training=training)
        return out

    # vmap over the conformer axis; state is read-only (no bn1d by config)
    embeds = jax.vmap(per_conformer, in_axes=1, out_axes=1)(full_bfm)
    # embeds: (B, K, emb)

    def scan_step(h, xs):
        x, m = xs
        h_new = _seq_gru_step(params["seq_gru"], x, h)
        h = jnp.where(m[:, None] > 0, h_new, h)
        return h, None

    h0 = jnp.zeros((B, cfg.seq_width), embeds.dtype)
    h_final, _ = jax.lax.scan(
        scan_step, h0,
        (jnp.moveaxis(embeds, 1, 0), jnp.moveaxis(conf_mask, 1, 0)))
    out = linear_apply(params["head"], h_final)
    return out, state


# ---------------------------------------------------------------------------
# collation
# ---------------------------------------------------------------------------

def collate_ensemble(conformer_sets: List[List], num_nodes: int,
                     max_conformers: int):
    """conformer_sets: per molecule, a list of MolGraphs sharing topology
    but carrying different e_dist (graphs.from_mol_3d output). Returns a
    dense ensemble batch dict."""
    from mpnn_tpu.graphs.batching import collate_dense
    firsts = [cs[0] for cs in conformer_sets]
    base = collate_dense(firsts, num_nodes=num_nodes, with_nafm=False)
    B = len(conformer_sets)
    n = num_nodes
    e_dist = np.zeros((B, max_conformers, n, n), np.float32)
    conf_mask = np.zeros((B, max_conformers), np.float32)
    for i, cs in enumerate(conformer_sets):
        a = cs[0].num_atoms
        for k, g in enumerate(cs[:max_conformers]):
            e_dist[i, k, :a, :a] = g.e_dist
            conf_mask[i, k] = 1.0
    base["e_dist"] = e_dist
    base["conf_mask"] = conf_mask
    return base
