"""Pallas kernel tests (interpret mode on CPU; compiled path exercised on
TPU by bench.py/scripts)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpnn_tpu import ops
from mpnn_tpu.kernels.edge_mlp import (
    edge_mlp_forward, make_edge_mlp_op,
)
from mpnn_tpu.ops.message import _edge_mlp_penultimate

EF, NF, MF, TAIL, E = 8, 23, 23, 5, 300


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    params = ops.edge_network_init(key, NF, EF, MF, tail_repeats=TAIL)
    e = jax.random.normal(jax.random.PRNGKey(1), (E, EF))
    head_ws = tuple(l["w"] for l in params["head"])
    head_bs = tuple(l["b"] for l in params["head"])
    shared = params["shared"]["w"]
    ref = _edge_mlp_penultimate(params, e, jax.nn.relu, TAIL)
    return e, head_ws, head_bs, shared, ref


def test_forward_matches_reference(setup):
    e, head_ws, head_bs, shared, ref = setup
    pen = edge_mlp_forward(e, head_ws, head_bs, shared, tail=TAIL,
                           block=128, interpret=True)
    np.testing.assert_allclose(np.asarray(pen), np.asarray(ref), atol=2e-4)


def test_forward_odd_sizes(setup):
    e, head_ws, head_bs, shared, ref = setup
    # E not a multiple of the block
    pen = edge_mlp_forward(e[:77], head_ws, head_bs, shared, tail=TAIL,
                           block=64, interpret=True)
    np.testing.assert_allclose(np.asarray(pen), np.asarray(ref[:77]),
                               atol=2e-4)


def test_custom_vjp_matches_autodiff(setup):
    e, head_ws, head_bs, shared, ref = setup
    op = make_edge_mlp_op(TAIL, block=128, interpret=True)

    def loss_kernel(e, hw, hb, sw):
        return (op(e, hw, hb, sw) ** 2).sum()

    def loss_ref(e, hw, hb, sw):
        params = {"head": [{"w": w, "b": b} for w, b in zip(hw, hb)],
                  "shared": {"w": sw}}
        return (_edge_mlp_penultimate(params, e, jax.nn.relu, TAIL) ** 2).sum()

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(
        e, head_ws, head_bs, shared)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(
        e, head_ws, head_bs, shared)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_zero_tail(setup):
    e, head_ws, head_bs, shared, _ = setup
    pen = edge_mlp_forward(e, head_ws, head_bs, shared, tail=0,
                           block=128, interpret=True)
    params = {"head": [{"w": w, "b": b} for w, b in zip(head_ws, head_bs)],
              "shared": {"w": shared}}
    ref = _edge_mlp_penultimate(params, e, jax.nn.relu, 0)
    np.testing.assert_allclose(np.asarray(pen), np.asarray(ref), atol=2e-4)


# ---------------------------------------------------------------------------
# windowed one-hot SpMM (kernels/spmm.py)
# ---------------------------------------------------------------------------

class TestSpmm:
    K, NFS, MFS = 7, 10, 10

    def _batch(self, n_graphs=40, seed=0):
        """Molecular-like packed layout: contiguous node blocks per graph,
        local edges, padded tail pointing at the dummy node."""
        rs = np.random.RandomState(seed)
        srcs, dsts, vids = [], [], []
        off = 0
        for _ in range(n_graphs):
            a = rs.randint(3, 24)
            ne = 2 * rs.randint(a - 1, 2 * a)
            s = rs.randint(0, a, ne) + off
            d = rs.randint(0, a, ne) + off
            srcs.append(s)
            dsts.append(d)
            vids.append(rs.randint(1, self.K, ne))
            off += a
        src = np.concatenate(srcs).astype(np.int32)
        dst = np.concatenate(dsts).astype(np.int32)
        vid = np.concatenate(vids).astype(np.int32)
        e = src.shape[0]
        node_cap = int(-(-(off + 1) // 128) * 128)
        edge_cap = int(-(-e // 128) * 128)
        mask = np.zeros(edge_cap, np.float32)
        mask[:e] = 1
        src = np.concatenate([src, np.full(edge_cap - e, node_cap - 1,
                                           np.int32)])
        dst = np.concatenate([dst, np.full(edge_cap - e, node_cap - 1,
                                           np.int32)])
        vid = np.concatenate([vid, np.zeros(edge_cap - e, np.int32)])
        h = rs.randn(node_cap, self.NFS).astype(np.float32)
        h[off:] = 0                     # dummy/pad node rows are zero
        a_mats = rs.randn(self.K, self.MFS, self.NFS).astype(np.float32)
        a_mats[0] = 0                   # id 0 = zero matrix (padding)
        return a_mats, h, vid, src, dst, mask, node_cap

    @pytest.mark.parametrize("layout", ["vmem", "hbm"])
    def test_plan_and_forward_parity(self, layout):
        from mpnn_tpu.kernels.spmm import (make_spmm_op, plan_edge_windows,
                                           spmm_reference)
        a, h, vid, src, dst, mask, node_cap = self._batch()
        plan = plan_edge_windows(src, dst, mask, node_cap, block_edges=128)
        assert plan is not None
        op = make_spmm_op(block_edges=plan.block_edges, window=plan.window,
                          interpret=True, layout=layout)
        out = op(jnp.asarray(a), jnp.asarray(h), jnp.asarray(vid),
                 jnp.asarray(src), jnp.asarray(dst),
                 jnp.asarray(plan.win_start))
        ref = spmm_reference(jnp.asarray(a), jnp.asarray(h),
                             jnp.asarray(vid), jnp.asarray(src),
                             jnp.asarray(dst))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4)

    @pytest.mark.parametrize("layout", ["vmem", "hbm"])
    def test_grad_parity(self, layout):
        from mpnn_tpu.kernels.spmm import (make_spmm_op, plan_edge_windows,
                                           spmm_reference)
        a, h, vid, src, dst, mask, node_cap = self._batch(n_graphs=12, seed=3)
        plan = plan_edge_windows(src, dst, mask, node_cap, block_edges=128)
        op = make_spmm_op(block_edges=plan.block_edges, window=plan.window,
                          interpret=True, layout=layout)
        va, vh = jnp.asarray(a), jnp.asarray(h)
        args = (jnp.asarray(vid), jnp.asarray(src), jnp.asarray(dst))
        w = jnp.asarray(plan.win_start)
        g_target = jnp.asarray(
            np.random.RandomState(9).randn(h.shape[0],
                                           self.MFS).astype(np.float32))

        def lk(a_, h_):
            return (op(a_, h_, *args, w) * g_target).sum()

        def lr(a_, h_):
            return (spmm_reference(a_, h_, *args) * g_target).sum()

        gk = jax.grad(lk, argnums=(0, 1))(va, vh)
        gr = jax.grad(lr, argnums=(0, 1))(va, vh)
        for x, y in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-3, atol=1e-3)

    def test_planner_rejects_nonlocal_edges(self):
        from mpnn_tpu.kernels.spmm import plan_edge_windows
        # one edge spanning the whole node axis in every block
        src = np.arange(4096, dtype=np.int32) % 4000
        dst = (4095 - np.arange(4096, dtype=np.int32)) % 4000
        mask = np.ones(4096, np.float32)
        assert plan_edge_windows(src, dst, mask, 4096,
                                 block_edges=128) is None

    def test_empty_and_full_blocks(self):
        """Blocks made only of padded edges must contribute nothing."""
        from mpnn_tpu.kernels.spmm import (make_spmm_op, plan_edge_windows,
                                           spmm_reference)
        a, h, vid, src, dst, mask, node_cap = self._batch(n_graphs=3, seed=5)
        # extend padding so several all-padding blocks exist
        extra = 512
        src = np.concatenate([src, np.full(extra, node_cap - 1, np.int32)])
        dst = np.concatenate([dst, np.full(extra, node_cap - 1, np.int32)])
        vid = np.concatenate([vid, np.zeros(extra, np.int32)])
        mask = np.concatenate([mask, np.zeros(extra, np.float32)])
        plan = plan_edge_windows(src, dst, mask, node_cap, block_edges=128)
        op = make_spmm_op(block_edges=plan.block_edges, window=plan.window,
                          interpret=True)
        out = op(jnp.asarray(a), jnp.asarray(h), jnp.asarray(vid),
                 jnp.asarray(src), jnp.asarray(dst),
                 jnp.asarray(plan.win_start))
        ref = spmm_reference(jnp.asarray(a), jnp.asarray(h),
                             jnp.asarray(vid), jnp.asarray(src),
                             jnp.asarray(dst))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4)


@pytest.mark.slow
class TestSddmm:
    """Fused attention SDDMM kernel vs the XLA gather reference."""

    def _batch(self, seed=0):
        t = TestSpmm()
        a, h, vid, src, dst, mask, node_cap = t._batch(n_graphs=20,
                                                       seed=seed)
        rs = np.random.RandomState(seed + 100)
        K, NFS = t.K, t.NFS
        evocab = rs.randn(K, 6).astype(np.float32)
        wa = rs.randn(NFS + 6, NFS).astype(np.float32) * 0.3
        ba = rs.randn(NFS).astype(np.float32) * 0.1
        return a, evocab, wa, ba, h, vid, src, dst, mask, node_cap

    def test_forward_and_grad_parity(self):
        self._run_parity(bwd="xla")

    def test_fused_backward_parity(self):
        """The one-pass Pallas backward (gate recompute + six gradients)
        vs the XLA reference VJP."""
        self._run_parity(bwd="kernel")

    def test_transposed_layout_parity(self):
        """The (features-in-sublanes) layout — fwd and the fused bwd —
        with its 128-aligned window plan."""
        self._run_parity(bwd="kernel", layout="t")

    def _run_parity(self, bwd, layout="rows"):
        from mpnn_tpu.kernels.sddmm import (make_sddmm_op,
                                            sddmm_att_reference)
        from mpnn_tpu.kernels.spmm import plan_edge_windows
        a, evocab, wa, ba, h, vid, src, dst, mask, node_cap = self._batch()
        align = 128 if layout == "t" else 16
        plan = plan_edge_windows(src, dst, mask, node_cap,
                                 block_edges=128, align=align)
        op = make_sddmm_op(block_edges=plan.block_edges,
                           window=plan.window, interpret=True, bwd=bwd,
                           layout=layout)
        args = tuple(jnp.asarray(x) for x in
                     (a, evocab, wa, ba, h, vid, src, dst))
        w = jnp.asarray(plan.win_start)
        out = op(*args, w)
        ref = sddmm_att_reference(*args)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4)

        gt = jnp.asarray(np.random.RandomState(5).randn(
            *ref.shape).astype(np.float32))

        def lk(a_, ev_, wa_, ba_, h_):
            return (op(a_, ev_, wa_, ba_, h_, *args[5:], w) * gt).sum()

        def lr(a_, ev_, wa_, ba_, h_):
            return (sddmm_att_reference(a_, ev_, wa_, ba_, h_,
                                        *args[5:]) * gt).sum()

        gk = jax.grad(lk, argnums=(0, 1, 2, 3, 4))(*args[:5])
        gr = jax.grad(lr, argnums=(0, 1, 2, 3, 4))(*args[:5])
        for x, y in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-4, atol=1e-4)


@pytest.mark.slow
class TestSddmmGridPads:
    def test_all_pad_final_block_contributes_nothing(self):
        """Grid-padding edges in an EMPTY final block (win start clipped
        to 0) must not alias node 0: unlike the SpMM kernels, SDDMM's
        vocab row 0 (A'_0 = bias fold) is NONZERO, so zero-filled pad
        src/dst used to add spurious messages to real node 0 (fixed by
        -1 fill). The batch-level pad edges (src=dst=sink) are shared
        with the XLA reference and stay."""
        from mpnn_tpu.kernels.sddmm import (make_sddmm_op,
                                            sddmm_att_reference)
        from mpnn_tpu.kernels.spmm import plan_edge_windows
        t = TestSddmm()
        a, evocab, wa, ba, h, vid, src, dst, mask, node_cap = t._batch()
        # production aprime has a NONZERO row 0 (pen(zero-row)·W̃ + bias,
        # models/sparse.py:205) — the test batch zeroes it, which would
        # mask exactly the bug this test exists for
        a = a.copy()
        a[0] = np.random.RandomState(42).randn(*a[0].shape) * 0.3
        extra = 500                      # NOT a multiple of 128 → grid pads
        sink = node_cap - 1
        src = np.concatenate([src, np.full(extra, sink, np.int32)])
        dst = np.concatenate([dst, np.full(extra, sink, np.int32)])
        vid = np.concatenate([vid, np.zeros(extra, np.int32)])
        mask = np.concatenate([mask, np.zeros(extra, np.float32)])
        plan = plan_edge_windows(src, dst, mask, node_cap, block_edges=128)
        op = make_sddmm_op(block_edges=plan.block_edges,
                           window=plan.window, interpret=True, bwd="kernel")
        args = tuple(jnp.asarray(x) for x in
                     (a, evocab, wa, ba, h, vid, src, dst))
        w = jnp.asarray(plan.win_start)
        out = op(*args, w)
        ref = sddmm_att_reference(*args)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4)
        gt = jnp.asarray(np.random.RandomState(5).randn(
            *ref.shape).astype(np.float32))
        gk = jax.grad(lambda h_: (op(*args[:4], h_, *args[5:], w)
                                  * gt).sum())(args[4])
        gr = jax.grad(lambda h_: (sddmm_att_reference(
            *args[:4], h_, *args[5:]) * gt).sum())(args[4])
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                   rtol=1e-4, atol=1e-4)


class TestRecurrence:
    """Fused BN→GRU→BN recurrence kernel vs the pure-JAX reference."""

    F, N, T = 10, 256, 4

    def _inputs(self, seed=0):
        import jax
        from mpnn_tpu.ops.update import gru_init
        from mpnn_tpu.ops.norm import bn1d_init
        rs = np.random.RandomState(seed)
        msgs = rs.randn(self.N, self.F).astype(np.float32)
        h0 = rs.randn(self.N, self.F).astype(np.float32)
        mask = (rs.rand(self.N, 1) > 0.25).astype(np.float32)
        gru = gru_init(jax.random.PRNGKey(seed), self.F, self.F)
        ma_p, _ = bn1d_init(self.F)
        bn_p, _ = bn1d_init(self.F)
        # non-trivial affine params so their grads are exercised
        ma_p = {"weight": jnp.asarray(rs.rand(self.F).astype(np.float32)
                                      + 0.5),
                "bias": jnp.asarray(rs.randn(self.F).astype(np.float32))}
        bn_p = {"weight": jnp.asarray(rs.rand(self.F).astype(np.float32)
                                      + 0.5),
                "bias": jnp.asarray(rs.randn(self.F).astype(np.float32))}
        return (jnp.asarray(msgs), jnp.asarray(h0), jnp.asarray(mask),
                gru, ma_p, bn_p)

    def test_reference_matches_sparse_loop(self):
        """The reference recurrence must equal bn1d_apply+gru_apply chained
        the way sparse_mpnn_apply chains them."""
        from mpnn_tpu.kernels.recurrence import reference_recurrence
        from mpnn_tpu.ops.norm import bn1d_apply, bn1d_init
        from mpnn_tpu.ops.update import gru_apply
        msgs, h0, mask, gru, ma_p, bn_p = self._inputs()
        _, ma_s = bn1d_init(self.F)
        _, bn_s = bn1d_init(self.F)
        mb, ma_s = bn1d_apply(ma_p, ma_s, msgs, mask, training=True)
        h = h0 * mask
        for _ in range(self.T):
            h = gru_apply(gru, mb[None], h[None], mask[None])[0]
            h, bn_s = bn1d_apply(bn_p, bn_s, h, mask, training=True)
        want = h
        got, ma_stats, step_stats = reference_recurrence(
            msgs, h0, mask, gru, ma_p, bn_p, steps=self.T)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)
        # EMA'd running stats match too
        rm = (1 - 0.1) * 0 + 0.1 * np.asarray(ma_stats[0])
        np.testing.assert_allclose(rm, np.asarray(ma_s["running_mean"]),
                                   atol=1e-6)

    @pytest.mark.slow
    def test_kernel_forward_and_grads(self):
        from mpnn_tpu.kernels.recurrence import (make_recurrence_op,
                                                 reference_recurrence)
        msgs, h0, mask, gru, ma_p, bn_p = self._inputs(3)
        op = make_recurrence_op(self.T, self.F, self.N, interpret=True)
        got, gst, gsteps = op(msgs, h0, mask, gru, ma_p, bn_p)
        want, wst, wsteps = reference_recurrence(
            msgs, h0, mask, gru, ma_p, bn_p, steps=self.T)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(gst[0]), np.asarray(wst[0]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(gsteps[-1][1]),
                                   np.asarray(wsteps[-1][1]), atol=1e-5)

        gt = jnp.asarray(np.random.RandomState(7).randn(
            self.N, self.F).astype(np.float32))

        def lk(m_, h_, g_, a_, b_):
            out, _, _ = op(m_, h_, mask, g_, a_, b_)
            return (out * gt).sum()

        def lr(m_, h_, g_, a_, b_):
            out, _, _ = reference_recurrence(m_, h_, mask, g_, a_, b_,
                                             steps=self.T)
            return (out * gt).sum()

        gk = jax.grad(lk, argnums=(0, 1, 2, 3, 4))(msgs, h0, gru, ma_p,
                                                   bn_p)
        gr_ = jax.grad(lr, argnums=(0, 1, 2, 3, 4))(msgs, h0, gru, ma_p,
                                                    bn_p)
        for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gr_)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-4)

    def test_blocked_forward_matches_reference(self):
        """Streaming (node-blocked) forward vs the reference — looser
        tolerance: single-pass variance (E[x²] − μ²)."""
        from mpnn_tpu.kernels.recurrence import (
            make_recurrence_op_blocked, reference_recurrence)
        msgs, h0, mask, gru, ma_p, bn_p = self._inputs(5)
        op = make_recurrence_op_blocked(self.T, self.F, self.N, blk=128,
                                        interpret=True)
        got, gst, gsteps = op(msgs, h0, mask, gru, ma_p, bn_p)
        want, wst, wsteps = reference_recurrence(
            msgs, h0, mask, gru, ma_p, bn_p, steps=self.T)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-3, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(gst[1]), np.asarray(wst[1]),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gsteps[-1][0]),
                                   np.asarray(wsteps[-1][0]),
                                   rtol=1e-3, atol=1e-4)

    def test_blocked_fused_backward_all_grads(self):
        """Streaming reverse-walk backward (grid over reversed steps ×
        node blocks) vs the reference VJP — every gradient leaf."""
        from mpnn_tpu.kernels.recurrence import (
            make_recurrence_op_blocked, reference_recurrence)
        msgs, h0, mask, gru, ma_p, bn_p = self._inputs(9)
        op = make_recurrence_op_blocked(self.T, self.F, self.N, blk=128,
                                        interpret=True, bwd_mode="fused")
        gt = jnp.asarray(np.random.RandomState(11).randn(
            self.N, self.F).astype(np.float32))

        def lk(m_, h_, g_, a_, b_):
            out, _, _ = op(m_, h_, mask, g_, a_, b_)
            return (out * gt).sum()

        def lr(m_, h_, g_, a_, b_):
            out, _, _ = reference_recurrence(m_, h_, mask, g_, a_, b_,
                                             steps=self.T)
            return (out * gt).sum()

        gk = jax.grad(lk, argnums=(0, 1, 2, 3, 4))(msgs, h0, gru, ma_p,
                                                   bn_p)
        gr_ = jax.grad(lr, argnums=(0, 1, 2, 3, 4))(msgs, h0, gru, ma_p,
                                                    bn_p)
        for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gr_)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-4)

    def test_blocked_grads_flow(self):
        from mpnn_tpu.kernels.recurrence import (
            make_recurrence_op_blocked, reference_recurrence)
        msgs, h0, mask, gru, ma_p, bn_p = self._inputs(6)
        op = make_recurrence_op_blocked(self.T, self.F, self.N, blk=128,
                                        interpret=True, bwd_mode="xla")
        gt = jnp.asarray(np.random.RandomState(8).randn(
            self.N, self.F).astype(np.float32))

        def lk(m_, h_):
            out, _, _ = op(m_, h_, mask, gru, ma_p, bn_p)
            return (out * gt).sum()

        def lr(m_, h_):
            out, _, _ = reference_recurrence(m_, h_, mask, gru, ma_p, bn_p,
                                             steps=self.T)
            return (out * gt).sum()

        gk = jax.grad(lk, argnums=(0, 1))(msgs, h0)
        gr_ = jax.grad(lr, argnums=(0, 1))(msgs, h0)
        for a, b in zip(gk, gr_):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-3)

    def test_merged_forward_matches_reference(self):
        """Merged-pass streaming forward (T+2 passes, gates/normalize
        recomputed inline) vs the reference — single-pass variance
        tolerance like the blocked variant."""
        from mpnn_tpu.kernels.recurrence import (
            make_recurrence_op_merged, reference_recurrence)
        msgs, h0, mask, gru, ma_p, bn_p = self._inputs(12)
        op = make_recurrence_op_merged(self.T, self.F, self.N, blk=128,
                                       interpret=True)
        got, gst, gsteps = op(msgs, h0, mask, gru, ma_p, bn_p)
        want, wst, wsteps = reference_recurrence(
            msgs, h0, mask, gru, ma_p, bn_p, steps=self.T)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-3, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(gst[0]), np.asarray(wst[0]),
                                   rtol=1e-3, atol=1e-4)
        for (gm, gv), (wm, wv) in zip(gsteps, wsteps):
            np.testing.assert_allclose(np.asarray(gm), np.asarray(wm),
                                       rtol=1e-3, atol=1e-4)
            np.testing.assert_allclose(np.asarray(gv), np.asarray(wv),
                                       rtol=1e-3, atol=1e-4)

    @pytest.mark.parametrize("bwd_impl", ["stream", "vmem"])
    def test_merged_fused_backward_all_grads(self, bwd_impl):
        """Merged-pass backward — both implementations: the streaming
        reverse (reduction of step t-1 fused into the apply of step t)
        and the VMEM-resident single-pass walk — vs the reference VJP,
        every gradient leaf."""
        from mpnn_tpu.kernels.recurrence import (
            make_recurrence_op_merged, reference_recurrence)
        msgs, h0, mask, gru, ma_p, bn_p = self._inputs(13)
        op = make_recurrence_op_merged(self.T, self.F, self.N, blk=128,
                                       interpret=True, bwd_mode="fused",
                                       bwd_impl=bwd_impl)
        gt = jnp.asarray(np.random.RandomState(14).randn(
            self.N, self.F).astype(np.float32))

        def lk(m_, h_, g_, a_, b_):
            out, _, _ = op(m_, h_, mask, g_, a_, b_)
            return (out * gt).sum()

        def lr(m_, h_, g_, a_, b_):
            out, _, _ = reference_recurrence(m_, h_, mask, g_, a_, b_,
                                             steps=self.T)
            return (out * gt).sum()

        gk = jax.grad(lk, argnums=(0, 1, 2, 3, 4))(msgs, h0, gru, ma_p,
                                                   bn_p)
        gr_ = jax.grad(lr, argnums=(0, 1, 2, 3, 4))(msgs, h0, gru, ma_p,
                                                    bn_p)
        for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gr_)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-4)

    def test_merged_single_block_and_uneven(self):
        """blk ≥ N (one block) and a non-dividing blk both stay correct."""
        from mpnn_tpu.kernels.recurrence import (
            make_recurrence_op_merged, reference_recurrence)
        msgs, h0, mask, gru, ma_p, bn_p = self._inputs(15)
        want, _, _ = reference_recurrence(msgs, h0, mask, gru, ma_p, bn_p,
                                          steps=self.T)
        for blk in (512, 192):
            op = make_recurrence_op_merged(self.T, self.F, self.N, blk=blk,
                                           interpret=True)
            got, _, _ = op(msgs, h0, mask, gru, ma_p, bn_p)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-3, rtol=1e-3)
