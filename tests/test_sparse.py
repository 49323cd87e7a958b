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


@pytest.mark.slow
def test_edge_vocab_exactness():
    """The vocab dedup (edge-MLP once per DISTINCT bond-feature row) must
    reproduce the per-edge path: forward bitwise-tight, grads allclose
    (grad sums reassociate across the vocab groups)."""
    gs, ge = setup_graphs()
    for cfg_kw in (dict(msg_norm="bn1d", state_norm="bn1d", message_steps=6),
                   dict(message_fn="att_edge_network", aggregation="att")):
        cfg = mpnn_cfg(ge, **cfg_kw)
        params, state = models.mpnn_init(jax.random.PRNGKey(7), cfg)
        _, packed = dense_and_packed(gs)
        pv = G.attach_edge_vocab({k: np.asarray(v) if not np.isscalar(v)
                                  else v for k, v in packed.items()})
        assert "edge_vid" in pv, "vocab overflow on one-hot bond feats?"
        pv = {k: jnp.asarray(v) if not np.isscalar(v) else v
              for k, v in pv.items()}

        @jax.jit
        def loss(p, b):
            out, _ = sparse_mpnn_apply(p, state, cfg, b, training=True)
            return (out ** 2).mean(), out

        (l0, o0), g0 = jax.value_and_grad(loss, has_aux=True)(params, packed)
        (l1, o1), g1 = jax.value_and_grad(loss, has_aux=True)(params, pv)
        np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), atol=1e-5)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4)


def test_loader_cached_vocab_matches_per_batch_attach():
    """GraphLoader's dataset-wide cached vocab (per-batch concatenation +
    first-occurrence scan) must reproduce attach_edge_vocab's per-batch
    np.unique path exactly — outputs AND gradients — even though the id
    ASSIGNMENT differs (zero row pinned at 0 vs lexicographic)."""
    from mpnn_tpu.graphs.dataloader import GraphLoader
    gs, ge = setup_graphs()
    cfg = mpnn_cfg(ge, msg_norm="bn1d", state_norm="bn1d", message_steps=3)
    params, state = models.mpnn_init(jax.random.PRNGKey(3), cfg)
    loader = GraphLoader(gs, len(gs), collate="packed")
    assert loader._vocab_vids is not None
    lb = next(iter(loader))
    assert "edge_vid" in lb and "edge_vfirst" in lb
    # id 0 must be the zero (padding) row: pad edges carry vid 0 and the
    # gathered row at vfirst[0] is all-zero
    pad = np.asarray(lb["edge_mask"]) == 0
    if pad.any():
        assert (np.asarray(lb["edge_vid"])[pad] == 0).all()
    np.testing.assert_array_equal(
        np.asarray(lb["edge_feats"])[int(lb["edge_vfirst"][0])], 0)
    ref = G.attach_edge_vocab(
        {k: np.asarray(v) if not np.isscalar(v) else v
         for k, v in lb.items() if k not in ("edge_vid", "edge_vfirst")})
    lbj = {k: jnp.asarray(v) if not np.isscalar(v) else v
           for k, v in lb.items()}
    refj = {k: jnp.asarray(v) if not np.isscalar(v) else v
            for k, v in ref.items()}

    def loss(p, b):
        out, _ = sparse_mpnn_apply(p, state, cfg, b, training=True)
        return (out ** 2).mean(), out

    (l0, o0), g0 = jax.value_and_grad(loss, has_aux=True)(params, lbj)
    (l1, o1), g1 = jax.value_and_grad(loss, has_aux=True)(params, refj)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), atol=1e-5)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_spmm_kernel_through_full_model():
    """Flagship + GGNN forward/grad with the Pallas windowed SpMM wired in
    (interpret mode) must match the XLA sparse path."""
    from mpnn_tpu.kernels.spmm import attach_spmm_plan, make_spmm_op
    gs, ge = setup_graphs()
    _, packed = dense_and_packed(gs)
    pb = {k: np.asarray(v) if not np.isscalar(v) else v
          for k, v in packed.items()}
    pb = G.attach_edge_vocab(pb)
    pb = attach_spmm_plan(pb, block_edges=128)
    assert "spmm_win" in pb
    op = make_spmm_op(block_edges=pb.pop("spmm_block_edges"),
                      window=pb.pop("spmm_window"), interpret=True)
    pbj = {k: jnp.asarray(v) if not np.isscalar(v) else v
           for k, v in pb.items()}

    # GGNN variant needs edge types attached to RAW graphs
    from mpnn_tpu.graphs import attach_edge_types, with_edge_types
    gs2 = G.generate_molgraphs(SMILES, [0.1 * i for i in range(len(SMILES))])
    attach_edge_types(gs2)
    gs2, ge2 = G.encode_molgraphs(gs2)
    et = jnp.asarray(with_edge_types(
        G.collate_packed(gs2).as_dict(), gs2)["edge_types"])

    for cfg_kw, types in (
            (dict(msg_norm="bn1d", state_norm="bn1d", message_steps=6),
             False),
            (dict(message_fn="ggnn", edge_features=4,
                  ggnn_num_edge_types=4), True)):
        cfg = mpnn_cfg(ge, **cfg_kw)
        b = dict(pbj)
        if types:
            b["edge_types"] = et
        params, state = models.mpnn_init(jax.random.PRNGKey(11), cfg)

        def loss(p, use_kernel):
            out, _ = sparse_mpnn_apply(
                p, state, cfg, b, training=True,
                spmm_vocab_fn=op if use_kernel else None)
            return (out ** 2).mean(), out

        (l0, o0), g0 = jax.value_and_grad(
            lambda p: loss(p, False), has_aux=True)(params)
        (l1, o1), g1 = jax.value_and_grad(
            lambda p: loss(p, True), has_aux=True)(params)
        np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                                   atol=2e-4)
        for x, y in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=2e-3, atol=2e-3)


def test_sddmm_kernel_through_full_model():
    """att_edge_network (adj and att aggregations) with the fused SDDMM
    kernel (interpret) must match the XLA sparse path — fwd and grads."""
    from mpnn_tpu.kernels.sddmm import make_sddmm_op
    from mpnn_tpu.kernels.spmm import attach_spmm_plan
    gs, ge = setup_graphs()
    _, packed = dense_and_packed(gs)
    pb = {k: np.asarray(v) if not np.isscalar(v) else v
          for k, v in packed.items()}
    pb = G.attach_edge_vocab(pb)
    pb = attach_spmm_plan(pb, block_edges=128)
    op = make_sddmm_op(block_edges=pb.pop("spmm_block_edges"),
                       window=pb.pop("spmm_window"), interpret=True)
    pbj = {k: jnp.asarray(v) if not np.isscalar(v) else v
           for k, v in pb.items()}
    for agg in ("adj", "att"):
        cfg = mpnn_cfg(ge, message_fn="att_edge_network", aggregation=agg)
        params, state = models.mpnn_init(jax.random.PRNGKey(21), cfg)

        def loss(p, k):
            out, _ = sparse_mpnn_apply(p, state, cfg, pbj, training=True,
                                       sddmm_fn=op if k else None)
            return (out ** 2).mean(), out

        (l0, o0), g0 = jax.value_and_grad(
            lambda p: loss(p, False), has_aux=True)(params)
        (l1, o1), g1 = jax.value_and_grad(
            lambda p: loss(p, True), has_aux=True)(params)
        np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                                   atol=2e-4, err_msg=agg)
        for x, y in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=2e-3, atol=2e-3, err_msg=agg)


def test_fused_recurrence_through_full_model():
    """The fused BN→GRU→BN recurrence kernel (interpret) must reproduce the
    flagship sparse forward exactly: outputs, grads, AND the BN running
    stats (EMA'd per step)."""
    from mpnn_tpu.kernels.recurrence import make_recurrence_op
    gs, ge = setup_graphs()
    cfg = mpnn_cfg(ge, msg_norm="bn1d", state_norm="bn1d", message_steps=6)
    params, state = models.mpnn_init(jax.random.PRNGKey(31), cfg)
    _, packed = dense_and_packed(gs)
    pv = G.attach_edge_vocab({k: np.asarray(v) if not np.isscalar(v)
                              else v for k, v in packed.items()})
    pv = {k: jnp.asarray(v) if not np.isscalar(v) else v
          for k, v in pv.items()}
    n = int(pv["node_feats"].shape[0])
    op = make_recurrence_op(cfg.message_steps, cfg.node_features, n,
                            interpret=True)

    def loss(p, fuse):
        out, ns = sparse_mpnn_apply(p, state, cfg, pv, training=True,
                                    recurrence_fn=op if fuse else None)
        return (out ** 2).mean(), (out, ns)

    (l0, (o0, s0)), g0 = jax.value_and_grad(
        lambda p: loss(p, False), has_aux=True)(params)
    (l1, (o1, s1)), g1 = jax.value_and_grad(
        lambda p: loss(p, True), has_aux=True)(params)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), atol=2e-5)
    for a, b in zip(jax.tree.leaves(s0), jax.tree.leaves(s1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_recurrence_eligibility_gating():
    """Configs outside the fused kernel's contract must NOT take the fused
    branch (the hook is ignored, the sequential loop runs)."""
    from mpnn_tpu.models.sparse import recurrence_eligible
    gs, ge = setup_graphs()
    good = mpnn_cfg(ge, msg_norm="bn1d", state_norm="bn1d")
    assert recurrence_eligible(good, training=True)
    import dataclasses
    for kw in (dict(message_input="state"), dict(update_hidden="initial"),
               dict(share_message_weights=False), dict(msg_norm="none"),
               dict(per_step_norms=True), dict(concat_state_history=True)):
        bad = dataclasses.replace(good, **kw)
        assert not recurrence_eligible(bad, training=True), kw
    assert not recurrence_eligible(good, training=False)
    assert not recurrence_eligible(good, training=True, axis_name="data")


def test_edge_vocab_overflow_falls_back():
    """Continuous edge features blow the vocab cap → keys absent, per-edge
    path used (no crash, no silent wrong result)."""
    rng = np.random.RandomState(0)
    batch = {"edge_feats": rng.randn(64, 4).astype(np.float32)}
    out = G.attach_edge_vocab(batch, vocab_cap=16)
    assert "edge_vid" not in out and "edge_vfirst" not in out


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


def test_wadj_rejected():
    gs, ge = setup_graphs()
    cfg = mpnn_cfg(ge, message_fn="att_edge_network", aggregation="wadj")
    params, state = models.mpnn_init(jax.random.PRNGKey(2), cfg)
    _, packed = dense_and_packed(gs)
    with pytest.raises(NotImplementedError):
        sparse_mpnn_apply(params, state, cfg, packed, training=True)


@pytest.mark.parametrize("agg", ["adj", "att"])
def test_attention_family_parity(agg):
    """Sparse attention messages (incl. the A0 non-edge correction for the
    'att' aggregator) must equal the dense per-pair path."""
    gs, ge = setup_graphs()
    cfg = mpnn_cfg(ge, message_fn="att_edge_network", aggregation=agg)
    params, state = models.mpnn_init(jax.random.PRNGKey(5), cfg)
    dense, packed = dense_and_packed(gs)
    out_d, _ = models.mpnn_apply(params, state, cfg, dense["afm"],
                                 dense["bfm"], dense["adj"], dense["mask"],
                                 training=True)
    out_s, _ = sparse_mpnn_apply(params, state, cfg, packed, training=True)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_s),
                               atol=5e-4)


def test_set2vec_packed_parity():
    gs, ge = setup_graphs()
    cfg = mpnn_cfg(ge, message_fn="att_edge_network", aggregation="adj",
                   readout="set2vec", set2vec_steps=5)
    params, state = models.mpnn_init(jax.random.PRNGKey(6), cfg)
    dense, packed = dense_and_packed(gs)
    out_d, _ = models.mpnn_apply(params, state, cfg, dense["afm"],
                                 dense["bfm"], dense["adj"], dense["mask"],
                                 training=True)
    out_s, _ = sparse_mpnn_apply(params, state, cfg, packed, training=True)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_s),
                               atol=5e-4)


def test_ggnn_sparse_parity():
    gs, ge = setup_graphs()
    n_types = 5
    nf = ge.atom_width()
    cfg = models.MPNNConfig(node_features=nf, edge_features=n_types,
                            message_features=nf, output_dim=8,
                            message_fn="ggnn", ggnn_num_edge_types=n_types,
                            message_steps=3)
    params, state = models.mpnn_init(jax.random.PRNGKey(7), cfg)
    dense, packed = dense_and_packed(gs)
    rs = np.random.RandomState(8)
    # integer edge types consistent between the two layouts
    adj = np.asarray(dense["adj"])
    types_dense = (rs.randint(1, n_types + 1, size=adj.shape)
                   * adj).astype(np.int32)
    # symmetric types (undirected bonds)
    types_dense = np.maximum(types_dense, types_dense.transpose(0, 2, 1))
    src = np.asarray(packed["edge_src"])
    dst = np.asarray(packed["edge_dst"])
    emask = np.asarray(packed["edge_mask"])
    # map each packed edge back to its (graph, local) dense pair
    node_graph = np.asarray(packed["node_graph"])
    offsets = {}
    off = 0
    edge_types = np.zeros_like(src)
    for gi, g in enumerate(gs):
        offsets[gi] = off
        off += g.num_atoms
    for e in range(len(src)):
        if emask[e] == 0:
            continue
        gi = node_graph[src[e]]
        s_local = src[e] - offsets[gi]
        d_local = dst[e] - offsets[gi]
        edge_types[e] = types_dense[gi, s_local, d_local]
    packed = dict(packed)
    packed["edge_types"] = jnp.asarray(edge_types)
    out_d, _ = models.mpnn_apply(params, state, cfg, dense["afm"],
                                 jnp.asarray(types_dense), dense["adj"],
                                 dense["mask"], training=True)
    out_s, _ = sparse_mpnn_apply(params, state, cfg, packed, training=True)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_s),
                               atol=5e-4)


def test_bilinear_sparse_parity():
    nf = 2
    rs = np.random.RandomState(9)
    # synthetic graphs with ef = nf^3 edge features
    from mpnn_tpu.graphs.graph import MolGraph
    gs = []
    for i in range(4):
        a = rs.randint(3, 7)
        adj = np.triu((rs.rand(a, a) < 0.5).astype(np.int64), 1)
        adj = adj + adj.T
        src, dst = np.nonzero(adj)
        feats = rs.randn(len(src), nf ** 3).astype(np.float32)
        # symmetrize so both directions share features
        fdict = {}
        for k, (s, d) in enumerate(zip(src, dst)):
            key = (min(s, d), max(s, d))
            if key not in fdict:
                fdict[key] = feats[k]
            feats[k] = fdict[key]
        bfm = np.zeros((a, a, nf ** 3), np.float32)
        bfm[src, dst] = feats
        gs.append(MolGraph(
            afm=rs.randn(a, nf).astype(np.float32),
            nafm=np.zeros((a, 1), np.float32), bfm=bfm, adj=adj,
            edge_src=src.astype(np.int32), edge_dst=dst.astype(np.int32),
            edge_feats=feats, label=float(i), is_encoded=True))
    cfg = models.MPNNConfig(node_features=nf, edge_features=nf ** 3,
                            message_features=nf, output_dim=4,
                            message_fn="bilinear", aggregation="adj",
                            message_steps=2, message_input="state",
                            update_hidden="initial",
                            concat_state_history=True)
    params, state = models.mpnn_init(jax.random.PRNGKey(10), cfg)
    dense, packed = dense_and_packed(gs)
    out_d, _ = models.mpnn_apply(params, state, cfg, dense["afm"],
                                 dense["bfm"], dense["adj"], dense["mask"],
                                 training=True)
    out_s, _ = sparse_mpnn_apply(params, state, cfg, packed, training=True)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_s),
                               atol=5e-4)


def test_ggnn_end_to_end_from_molecules():
    """GGNN path from real molecules: attach_edge_types -> collate (packed
    with edge_types, dense int bfm) -> dense/sparse parity + training step."""
    import jax
    from mpnn_tpu.graphs import attach_edge_types, with_edge_types

    gs = G.generate_molgraphs(SMILES, [0.1 * i for i in range(len(SMILES))])
    attach_edge_types(gs)
    gs, ge = G.encode_molgraphs(gs)
    n_types = 4
    nf = ge.atom_width()
    cfg = models.MPNNConfig(node_features=nf, edge_features=n_types,
                            message_features=nf, output_dim=8,
                            message_fn="ggnn", ggnn_num_edge_types=n_types,
                            message_steps=3)
    params, state = models.mpnn_init(jax.random.PRNGKey(3), cfg)

    dense = with_edge_types(G.collate_dense(gs, with_nafm=False), gs)
    packed = with_edge_types(G.collate_packed(gs).as_dict(), gs)
    jb_d = {k: jnp.asarray(v) for k, v in dense.items()}
    jb_p = {k: jnp.asarray(v) if not np.isscalar(v) else v
            for k, v in packed.items()}
    out_d, _ = models.mpnn_apply(params, state, cfg, jb_d["afm"],
                                 jb_d["bfm"], jb_d["adj"], jb_d["mask"],
                                 training=True)
    out_s, _ = sparse_mpnn_apply(params, state, cfg, jb_p, training=True)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_s),
                               atol=5e-4)
    # aromatic bonds became type 2, singles type 1
    assert set(np.unique(packed["edge_types"])) >= {0, 1, 2}


def test_merged_recurrence_through_full_model():
    """The merged-pass streaming recurrence (multi-block, interpret) must
    reproduce the flagship sparse forward: outputs, grads, running stats —
    looser tolerance than the monolithic kernel (single-pass variance)."""
    from mpnn_tpu.kernels.recurrence import make_recurrence_op_merged
    gs, ge = setup_graphs()
    cfg = mpnn_cfg(ge, msg_norm="bn1d", state_norm="bn1d", message_steps=6)
    params, state = models.mpnn_init(jax.random.PRNGKey(33), cfg)
    _, packed = dense_and_packed(gs)
    pv = G.attach_edge_vocab({k: np.asarray(v) if not np.isscalar(v)
                              else v for k, v in packed.items()})
    pv = {k: jnp.asarray(v) if not np.isscalar(v) else v
          for k, v in pv.items()}
    n = int(pv["node_feats"].shape[0])
    op = make_recurrence_op_merged(cfg.message_steps, cfg.node_features, n,
                                   blk=128, interpret=True)

    def loss(p, fuse):
        out, ns = sparse_mpnn_apply(p, state, cfg, pv, training=True,
                                    recurrence_fn=op if fuse else None)
        return (out ** 2).mean(), (out, ns)

    (l0, (o0, s0)), g0 = jax.value_and_grad(
        lambda p: loss(p, False), has_aux=True)(params)
    (l1, (o1, s1)), g1 = jax.value_and_grad(
        lambda p: loss(p, True), has_aux=True)(params)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                               rtol=1e-3, atol=1e-3)
    for a, b in zip(jax.tree.leaves(s0), jax.tree.leaves(s1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)
