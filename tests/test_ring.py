"""Ring-partitioned SpMM tests on the 8-device virtual mesh: the fully
sharded (nodes AND edges) aggregation must equal the unsharded edge term."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpnn_tpu import graphs as G, models, parallel
from mpnn_tpu.models.sparse import (
    _edge_penultimates, sparse_edge_network_fused, sparse_mpnn_apply,
)
from mpnn_tpu.parallel.ring import (
    make_ring_spmm, partition_edges_ring, ring_edge_network_term,
)

SMILES = ["CCO", "c1ccccc1", "CC(=O)O", "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
          "CN1C=NC2=C1C(=O)N(C(=O)N2C)C", "C1CCCCC1", "NC(=O)c1ccccc1",
          "OC(=O)c1ccccc1O"]


@pytest.fixture(scope="module")
def setup():
    gs = G.generate_molgraphs(SMILES, [0.1 * i for i in range(len(SMILES))])
    gs, ge = G.encode_molgraphs(gs)
    nf = ge.atom_width()
    cfg = models.MPNNConfig(node_features=nf, edge_features=ge.bond_width(),
                            message_features=nf, output_dim=8,
                            edge_mlp_tail_repeats=3)
    params, _ = models.mpnn_init(jax.random.PRNGKey(0), cfg)
    packed = G.collate_packed(gs).as_dict()
    return gs, cfg, params, packed


def unsharded_edge_term(cfg, mparams, packed):
    """Σ_edges W̃(p_e − p_0) h_src — the edge part of the fused message
    (no A0 correction, no bias)."""
    h = jnp.asarray(packed["node_feats"])
    efeats = jnp.asarray(packed["edge_feats"])
    pen, pen0, _ = _edge_penultimates(mparams, efeats, cfg)
    pf = pen.shape[-1]
    wf = mparams["final"]["w"].reshape(pf, cfg.message_features,
                                      cfg.node_features)
    ptilde = pen - pen0
    v = jnp.einsum("pmf,nf->npm", wf, h)
    msg = jnp.einsum("ep,epm->em", ptilde, v[jnp.asarray(packed["edge_src"])])
    return jax.ops.segment_sum(msg, jnp.asarray(packed["edge_dst"]),
                               num_segments=h.shape[0])


@pytest.mark.parametrize("d", [2, 4, 8])
def test_ring_matches_unsharded(setup, d):
    gs, cfg, params, packed = setup
    mparams = params["message"][0]
    want = np.asarray(unsharded_edge_term(cfg, mparams, packed))

    ring_batch = partition_edges_ring(packed, d)
    s = ring_batch["shard_size"]
    mesh = parallel.make_mesh(data=8 // d, edge=d)
    got_sh = ring_edge_network_term(mesh, mparams, ring_batch, cfg)
    got = np.asarray(got_sh).reshape(d * s, -1)[:want.shape[0]]
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_ring_grads_flow(setup):
    gs, cfg, params, packed = setup
    mparams = params["message"][0]
    d = 4
    ring_batch = partition_edges_ring(packed, d)
    mesh = parallel.make_mesh(data=2, edge=d)

    def loss(mp, h_sh):
        out = ring_edge_network_term(mesh, mp, ring_batch, cfg,
                                     node_shards=h_sh)
        return (out ** 2).sum()

    h_sh = jnp.asarray(ring_batch["node_feats_sh"])
    g_mp, g_h = jax.jit(jax.grad(loss, argnums=(0, 1)))(mparams, h_sh)
    assert all(bool(jnp.isfinite(l).all()) for l in jax.tree.leaves(g_mp))
    assert bool(jnp.isfinite(g_h).all())
    # compare against the unsharded gradient wrt node features
    def loss_ref(h_flat):
        h = h_flat
        efeats = jnp.asarray(packed["edge_feats"])
        pen, pen0, _ = _edge_penultimates(mparams, efeats, cfg)
        pf = pen.shape[-1]
        wf = mparams["final"]["w"].reshape(pf, cfg.message_features,
                                          cfg.node_features)
        v = jnp.einsum("pmf,nf->npm", wf, h)
        msg = jnp.einsum("ep,epm->em", pen - pen0,
                         v[jnp.asarray(packed["edge_src"])])
        out = jax.ops.segment_sum(msg, jnp.asarray(packed["edge_dst"]),
                                  num_segments=h.shape[0])
        return (out ** 2).sum()

    n = packed["node_feats"].shape[0]
    g_ref = jax.grad(loss_ref)(jnp.asarray(packed["node_feats"]))
    got = np.asarray(g_h).reshape(-1, g_h.shape[-1])[:n]
    np.testing.assert_allclose(got, np.asarray(g_ref), atol=5e-3)


class TestRingForward:
    """Full ring-sharded MPNN forward vs the unsharded sparse path."""

    def _setup(self, msg_norm="bn1d", state_norm="bn1d"):
        gs = G.generate_molgraphs(SMILES,
                                  [0.1 * i for i in range(len(SMILES))])
        gs, ge = G.encode_molgraphs(gs)
        nf = ge.atom_width()
        cfg = models.MPNNConfig(
            node_features=nf, edge_features=ge.bond_width(),
            message_features=nf, output_dim=8, message_steps=3,
            msg_norm=msg_norm, state_norm=state_norm,
            edge_mlp_tail_repeats=3)
        params, state = models.mpnn_init(jax.random.PRNGKey(11), cfg)
        packed = G.collate_packed(gs).as_dict()
        return cfg, params, state, packed

    @pytest.mark.parametrize("d", [2, 4])
    def test_forward_parity(self, d):
        from mpnn_tpu.parallel.ring_train import make_ring_mpnn_forward
        cfg, params, state, packed = self._setup()
        jb = {k: jnp.asarray(v) if not np.isscalar(v) else v
              for k, v in packed.items()}
        want, want_state = sparse_mpnn_apply(params, state, cfg, jb,
                                             training=True)

        rb = partition_edges_ring(packed, d)
        rb = {k: jnp.asarray(v) if not np.isscalar(v) else v
              for k, v in rb.items()}
        mesh = parallel.make_mesh(data=8 // d, edge=d)
        fwd = make_ring_mpnn_forward(cfg, mesh)
        got, got_state = jax.jit(
            lambda p, s: fwd(p, s, rb, jnp.asarray(packed["graph_mask"]))
        )(params, state)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-4)
        for a, b in zip(jax.tree.leaves(want_state),
                        jax.tree.leaves(got_state)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4)

    def test_grad_parity(self):
        from mpnn_tpu.parallel.ring_train import make_ring_mpnn_forward
        cfg, params, state, packed = self._setup()
        jb = {k: jnp.asarray(v) if not np.isscalar(v) else v
              for k, v in packed.items()}
        rb_np = partition_edges_ring(packed, 4)
        rb = {k: jnp.asarray(v) for k, v in rb_np.items()
              if not np.isscalar(v)}
        mesh = parallel.make_mesh(data=2, edge=4)
        fwd = make_ring_mpnn_forward(cfg, mesh)
        gm = jnp.asarray(packed["graph_mask"])

        def loss_ring(p):
            out, _ = fwd(p, state, rb, gm)
            return (out ** 2).sum()

        def loss_ref(p):
            out, _ = sparse_mpnn_apply(p, state, cfg, jb, training=True)
            return (out ** 2).sum()

        g_ring = jax.jit(jax.grad(loss_ring))(params)
        g_ref = jax.grad(loss_ref)(params)
        flat_r = jax.tree_util.tree_flatten_with_path(g_ring)[0]
        flat_f = jax.tree_util.tree_flatten_with_path(g_ref)[0]
        for (path, a), (_, b) in zip(flat_r, flat_f):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-2,
                err_msg=jax.tree_util.keystr(path))

    def test_ggnn_forward_parity(self):
        """GGNN under the ring (A0 = 0 — no graph correction needed)."""
        from mpnn_tpu.graphs import attach_edge_types, with_edge_types
        from mpnn_tpu.parallel.ring_train import make_ring_mpnn_forward
        gs = G.generate_molgraphs(SMILES,
                                  [0.1 * i for i in range(len(SMILES))])
        attach_edge_types(gs)
        gs, ge = G.encode_molgraphs(gs)
        nf = ge.atom_width()
        cfg = models.MPNNConfig(
            node_features=nf, edge_features=4, ggnn_num_edge_types=4,
            message_features=nf, output_dim=8, message_fn="ggnn",
            message_steps=3, msg_norm="bn1d", state_norm="bn1d")
        params, state = models.mpnn_init(jax.random.PRNGKey(5), cfg)
        packed = with_edge_types(G.collate_packed(gs).as_dict(), gs)
        jb = {k: jnp.asarray(v) if not np.isscalar(v) else v
              for k, v in packed.items()}
        want, _ = sparse_mpnn_apply(params, state, cfg, jb, training=True)

        rb_np = partition_edges_ring(packed, 4)
        assert "ring_etypes" in rb_np
        rb = {k: jnp.asarray(v) for k, v in rb_np.items()
              if not np.isscalar(v)}
        mesh = parallel.make_mesh(data=2, edge=4)
        fwd = make_ring_mpnn_forward(cfg, mesh)
        got, _ = jax.jit(
            lambda p, s: fwd(p, s, rb, jnp.asarray(packed["graph_mask"]))
        )(params, state)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-4)

    @pytest.mark.parametrize("batch_softmax", [True, False])
    def test_set2vec_forward_parity(self, batch_softmax):
        """set2vec readout under the ring: psum'd softmax normalizers and
        attention reads must equal the packed sparse_set2vec."""
        from mpnn_tpu.parallel.ring_train import make_ring_mpnn_forward
        import dataclasses
        cfg, params, state, packed = self._setup()
        cfg = dataclasses.replace(cfg, readout="set2vec", set2vec_steps=7,
                                  set2vec_batch_softmax=batch_softmax,
                                  output_dim=cfg.node_features)
        params, state = models.mpnn_init(jax.random.PRNGKey(13), cfg)
        jb = {k: jnp.asarray(v) if not np.isscalar(v) else v
              for k, v in packed.items()}
        want, _ = sparse_mpnn_apply(params, state, cfg, jb, training=True)

        rb_np = partition_edges_ring(packed, 4)
        rb = {k: jnp.asarray(v) for k, v in rb_np.items()
              if not np.isscalar(v)}
        mesh = parallel.make_mesh(data=2, edge=4)
        fwd = make_ring_mpnn_forward(cfg, mesh)
        got, _ = jax.jit(
            lambda p, s: fwd(p, s, rb, jnp.asarray(packed["graph_mask"]))
        )(params, state)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-4)


class TestRingHalo:
    """Overlapped (async-remote-copy) ring SpMM kernel vs the ppermute
    reference and the unsharded A-form SpMM — interpret mode on the
    virtual mesh."""

    def _setup(self, d=4, seed=0):
        rs = np.random.RandomState(seed)
        K, NF, MF = 5, 10, 10
        gs_packed = []
        # synthetic packed batch with contiguous per-graph nodes
        srcs, dsts, vids, off = [], [], [], 0
        for _ in range(24):
            a = rs.randint(3, 12)
            ne = 2 * (a - 1)
            srcs.append(rs.randint(0, a, ne) + off)
            dsts.append(rs.randint(0, a, ne) + off)
            vids.append(rs.randint(1, K, ne))
            off += a
        src = np.concatenate(srcs).astype(np.int32)
        dst = np.concatenate(dsts).astype(np.int32)
        vid = np.concatenate(vids).astype(np.int32)
        n = off
        h = rs.randn(n, NF).astype(np.float32)
        amat = rs.randn(K, MF, NF).astype(np.float32)
        amat[0] = 0

        # ring layout: D node shards, buckets by (dst_shard, src_shard)
        s = -(-n // d)
        hp = np.concatenate([h, np.zeros((s * d - n, NF), np.float32)])
        buckets = {}
        for e in range(src.shape[0]):
            buckets.setdefault((dst[e] // s, src[e] // s), []).append(e)
        eb = max(len(v) for v in buckets.values())
        vb = np.zeros((d, d, eb), np.int32)      # vid 0 → zero matrix
        sb = np.zeros((d, d, eb), np.int32)
        db = np.zeros((d, d, eb), np.int32)
        for (pd_, ps_), idxs in buckets.items():
            kk = len(idxs)
            sb[pd_, ps_, :kk] = src[idxs] % s
            db[pd_, ps_, :kk] = dst[idxs] % s
            vb[pd_, ps_, :kk] = vid[idxs]
        return (jnp.asarray(amat), jnp.asarray(hp).reshape(d, s, NF),
                jnp.asarray(vb), jnp.asarray(sb), jnp.asarray(db),
                jnp.asarray(h), jnp.asarray(vid), jnp.asarray(src),
                jnp.asarray(dst), n, s)

    def test_overlapped_matches_reference_and_unsharded(self):
        from mpnn_tpu.kernels.ring_halo import (make_ring_halo_reference,
                                                make_ring_halo_spmm)
        from mpnn_tpu.kernels.spmm import spmm_reference
        d = 4
        (amat, h_sh, vb, sb, db, h, vid, src, dst, n, s) = self._setup(d)
        # interpret-mode remote DMA supports single-axis meshes only
        from jax.sharding import Mesh
        mesh = Mesh(np.asarray(jax.devices()[:d]), ("edge",))
        ref_ring = make_ring_halo_reference(mesh)
        op = make_ring_halo_spmm(mesh, interpret=True)
        want_ring = np.asarray(jax.jit(ref_ring)(h_sh, vb, sb, db, amat))
        got = np.asarray(jax.jit(op)(h_sh, vb, sb, db, amat))
        np.testing.assert_allclose(got, want_ring, atol=1e-4)
        # and both equal the unsharded SpMM
        want_flat = np.asarray(spmm_reference(amat, h, vid, src, dst))
        np.testing.assert_allclose(
            got.reshape(d * s, -1)[:n], want_flat, atol=1e-4)

    def test_gradients_flow(self):
        from mpnn_tpu.kernels.ring_halo import (make_ring_halo_reference,
                                                make_ring_halo_spmm)
        d = 4
        (amat, h_sh, vb, sb, db, h, vid, src, dst, n, s) = self._setup(d, 3)
        from jax.sharding import Mesh
        mesh = Mesh(np.asarray(jax.devices()[:d]), ("edge",))
        op = make_ring_halo_spmm(mesh, interpret=True)
        ref = make_ring_halo_reference(mesh)

        def lk(hh, aa):
            return (op(hh, vb, sb, db, aa) ** 2).sum()

        def lr(hh, aa):
            return (ref(hh, vb, sb, db, aa) ** 2).sum()

        gk = jax.jit(jax.grad(lk, argnums=(0, 1)))(h_sh, amat)
        gr = jax.jit(jax.grad(lr, argnums=(0, 1)))(h_sh, amat)
        for a, b in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-3)


@pytest.mark.slow
class TestRingTrainHalo:
    """Round-2 VERDICT item 3: the halo-exchange kernel WIRED into the
    production ring forward (edge_impl='halo'; ppermute stays the
    reference oracle). Interpret mode on the virtual mesh."""

    def test_edge_network_vocab_halo_forward_and_grads(self):
        from mpnn_tpu.parallel.ring_train import make_ring_mpnn_forward
        gs = G.generate_molgraphs(SMILES,
                                  [0.1 * i for i in range(len(SMILES))])
        gs, ge = G.encode_molgraphs(gs)
        nf = ge.atom_width()
        cfg = models.MPNNConfig(
            node_features=nf, edge_features=ge.bond_width(),
            message_features=nf, output_dim=8, message_steps=3,
            msg_norm="bn1d", state_norm="bn1d", edge_mlp_tail_repeats=3)
        params, state = models.mpnn_init(jax.random.PRNGKey(11), cfg)
        packed = G.attach_edge_vocab(G.collate_packed(gs).as_dict(),
                                     vocab_cap=16)
        jb = {k: jnp.asarray(v) if not np.isscalar(v) else v
              for k, v in packed.items()}
        want, _ = sparse_mpnn_apply(params, state, cfg, jb, training=True)

        rb_np = partition_edges_ring(packed, 4)
        assert "ring_vids" in rb_np and "ring_vrows" in rb_np
        rb = {k: jnp.asarray(v) for k, v in rb_np.items()
              if not np.isscalar(v)}
        # interpret-mode remote DMA supports single-axis meshes only
        from jax.sharding import Mesh
        mesh = Mesh(np.asarray(jax.devices()[:4]), ("edge",))
        gm = jnp.asarray(packed["graph_mask"])
        fwd = make_ring_mpnn_forward(cfg, mesh, edge_impl="halo",
                                     interpret=True)
        got, _ = jax.jit(lambda p, s: fwd(p, s, rb, gm))(params, state)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-4)

        # grads: the halo term's custom VJP rides the in-context ppermute
        # reference — must match the unsharded sparse grads
        def loss_halo(p):
            out, _ = fwd(p, state, rb, gm)
            return (out ** 2).sum()

        def loss_ref(p):
            out, _ = sparse_mpnn_apply(p, state, cfg, jb, training=True)
            return (out ** 2).sum()

        g_halo = jax.jit(jax.grad(loss_halo))(params)
        g_ref = jax.grad(loss_ref)(params)
        for (path, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(g_halo)[0],
                jax.tree_util.tree_flatten_with_path(g_ref)[0]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-2,
                err_msg=jax.tree_util.keystr(path))

    def test_ggnn_halo_forward(self):
        from mpnn_tpu.graphs import attach_edge_types, with_edge_types
        from mpnn_tpu.parallel.ring_train import make_ring_mpnn_forward
        gs = G.generate_molgraphs(SMILES,
                                  [0.1 * i for i in range(len(SMILES))])
        attach_edge_types(gs)
        gs, ge = G.encode_molgraphs(gs)
        nf = ge.atom_width()
        cfg = models.MPNNConfig(
            node_features=nf, edge_features=4, ggnn_num_edge_types=4,
            message_features=nf, output_dim=8, message_fn="ggnn",
            message_steps=3, msg_norm="bn1d", state_norm="bn1d")
        params, state = models.mpnn_init(jax.random.PRNGKey(5), cfg)
        packed = with_edge_types(G.collate_packed(gs).as_dict(), gs)
        jb = {k: jnp.asarray(v) if not np.isscalar(v) else v
              for k, v in packed.items()}
        want, _ = sparse_mpnn_apply(params, state, cfg, jb, training=True)
        rb_np = partition_edges_ring(packed, 4)
        rb = {k: jnp.asarray(v) for k, v in rb_np.items()
              if not np.isscalar(v)}
        from jax.sharding import Mesh
        mesh = Mesh(np.asarray(jax.devices()[:4]), ("edge",))
        fwd = make_ring_mpnn_forward(cfg, mesh, edge_impl="halo",
                                     interpret=True)
        got, _ = jax.jit(
            lambda p, s: fwd(p, s, rb, jnp.asarray(packed["graph_mask"]))
        )(params, state)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-4)

    def test_halo_without_vocab_raises(self):
        from mpnn_tpu.parallel.ring_train import make_ring_mpnn_forward
        gs = G.generate_molgraphs(SMILES[:4], [0.1, 0.2, 0.3, 0.4])
        gs, ge = G.encode_molgraphs(gs)
        nf = ge.atom_width()
        cfg = models.MPNNConfig(
            node_features=nf, edge_features=ge.bond_width(),
            message_features=nf, output_dim=4, message_steps=2,
            edge_mlp_tail_repeats=2)
        params, state = models.mpnn_init(jax.random.PRNGKey(0), cfg)
        packed = G.collate_packed(gs).as_dict()   # NO vocab
        rb = partition_edges_ring(packed, 4)
        from jax.sharding import Mesh
        mesh = Mesh(np.asarray(jax.devices()[:4]), ("edge",))
        fwd = make_ring_mpnn_forward(cfg, mesh, edge_impl="halo",
                                     interpret=True)
        with pytest.raises(ValueError, match="edge VOCAB"):
            fwd(params, state, rb, jnp.asarray(packed["graph_mask"]))
