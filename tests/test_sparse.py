"""Dense ↔ sparse path parity: same params, same molecules, same numbers.

The sparse path's A0 decomposition must reproduce the dense reference
semantics exactly (including bias leakage into non-edges) — SURVEY.md §7
CSR↔dense equivalence requirement."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpnn_tpu import graphs as G
from mpnn_tpu import models
from mpnn_tpu.models.sparse import sparse_mpnn_apply

SMILES = ["CCO", "c1ccccc1", "CC(=O)O", "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
          "CN1C=NC2=C1C(=O)N(C(=O)N2C)C", "C1CCCCC1", "NC(=O)c1ccccc1"]


def setup_graphs():
    gs = G.generate_molgraphs(SMILES, list(range(len(SMILES))))
    gs, ge = G.encode_molgraphs(gs)
    return gs, ge


def mpnn_cfg(ge, **kw):
    nf = ge.atom_width()
    defaults = dict(node_features=nf, edge_features=ge.bond_width(),
                    message_features=nf, output_dim=8, message_steps=3,
                    edge_mlp_tail_repeats=4)
    defaults.update(kw)
    return models.MPNNConfig(**defaults)


def dense_and_packed(gs):
    dense = G.collate_dense(gs, with_nafm=False)
    packed = G.collate_packed(gs).as_dict()
    return ({k: jnp.asarray(v) for k, v in dense.items()},
            {k: jnp.asarray(v) if not np.isscalar(v) else v
             for k, v in packed.items()})


@pytest.mark.parametrize("cfg_kw", [
    dict(),                                                     # basic
    dict(msg_norm="bn1d", state_norm="bn1d", message_steps=6),  # lipo-style
    dict(state_norm="stateless", share_message_weights=False),  # normed
    dict(message_input="state", update_hidden="initial"),       # ecfp quirks
])
def test_dense_sparse_parity(cfg_kw):
    gs, ge = setup_graphs()
    cfg = mpnn_cfg(ge, **cfg_kw)
    params, state = models.mpnn_init(jax.random.PRNGKey(317), cfg)
    dense, packed = dense_and_packed(gs)

    out_d, st_d = models.mpnn_apply(
        params, state, cfg, dense["afm"], dense["bfm"], dense["adj"],
        dense["mask"], training=True)
    out_s, st_s = sparse_mpnn_apply(params, state, cfg, packed,
                                    training=True)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_s),
                               atol=5e-4)
    # BN running stats must also agree (same masked statistics)
    for k in ("bn", "ma_bn"):
        if k in st_d:
            for sd, ss in zip(st_d[k], st_s[k]):
                np.testing.assert_allclose(
                    np.asarray(sd["running_mean"]),
                    np.asarray(ss["running_mean"]), atol=5e-4)


def test_parity_under_jit_and_grad():
    gs, ge = setup_graphs()
    cfg = mpnn_cfg(ge, msg_norm="bn1d", state_norm="bn1d")
    params, state = models.mpnn_init(jax.random.PRNGKey(0), cfg)
    dense, packed = dense_and_packed(gs)

    @jax.jit
    def loss_d(p):
        out, _ = models.mpnn_apply(p, state, cfg, dense["afm"], dense["bfm"],
                                   dense["adj"], dense["mask"], training=True)
        return (out ** 2).mean()

    @jax.jit
    def loss_s(p):
        out, _ = sparse_mpnn_apply(p, state, cfg, packed, training=True)
        # dense mean over (B, out); packed graph rows identical
        return (out ** 2).mean()

    gd = jax.grad(loss_d)(params)
    gss = jax.grad(loss_s)(params)
    for pd, ps in zip(jax.tree.leaves(gd), jax.tree.leaves(gss)):
        np.testing.assert_allclose(np.asarray(pd), np.asarray(ps),
                                   atol=5e-3)


def test_padded_edges_are_null():
    """Enlarging edge/node capacity must not change outputs."""
    gs, ge = setup_graphs()
    cfg = mpnn_cfg(ge)
    params, state = models.mpnn_init(jax.random.PRNGKey(1), cfg)
    p1 = G.collate_packed(gs).as_dict()
    p2 = G.collate_packed(gs, node_cap=256, edge_cap=512).as_dict()
    o1, _ = sparse_mpnn_apply(params, state, cfg,
                              {k: jnp.asarray(v) if not np.isscalar(v) else v
                               for k, v in p1.items()}, training=True)
    o2, _ = sparse_mpnn_apply(params, state, cfg,
                              {k: jnp.asarray(v) if not np.isscalar(v) else v
                               for k, v in p2.items()}, training=True)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-4)


def test_unsupported_configs_raise():
    gs, ge = setup_graphs()
    cfg = mpnn_cfg(ge, message_fn="att_edge_network", aggregation="att")
    params, state = models.mpnn_init(jax.random.PRNGKey(2), cfg)
    _, packed = dense_and_packed(gs)
    with pytest.raises(NotImplementedError):
        sparse_mpnn_apply(params, state, cfg, packed, training=True)
