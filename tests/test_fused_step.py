"""Parity tests for the whole-step fused kernel (kernels/fused_step.py)
against the pure-JAX composition of proven pieces (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpnn_tpu.kernels.fused_step import (attach_fused_plan,
                                         make_fused_step_op,
                                         plan_fused_step,
                                         reference_fused_step)


def build_problem(rng, n=256, g=40, f=8, od=6, k=5, steps=3, be=128,
                  real_frac=0.9):
    """Synthetic packed-like batch: contiguous graphs over n nodes."""
    n_real = int(n * real_frac)
    bounds = np.sort(rng.choice(np.arange(1, n_real), g - 1, replace=False))
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [n_real]])
    node_graph = np.full(n, g, np.int32)           # sentinel at pads
    for gi, (s, e) in enumerate(zip(starts, ends)):
        node_graph[s:e] = gi
    mask = (np.arange(n) < n_real).astype(np.float32)[:, None]

    edges = []
    for gi, (s, e) in enumerate(zip(starts, ends)):
        nodes = np.arange(s, e)
        if len(nodes) < 2:
            continue
        for _ in range(3 * len(nodes)):
            a, b = rng.choice(nodes, 2)
            edges.append((a, b))
    src = np.array([a for a, _ in edges], np.int32)
    dst = np.array([b for _, b in edges], np.int32)
    e = len(edges)
    vid = rng.randint(0, k, e).astype(np.int32)
    edge_mask = np.ones(e, np.float32)

    amat = rng.randn(k, f, f).astype(np.float32) * 0.2
    a0 = rng.randn(f, f).astype(np.float32) * 0.1
    mbias = rng.randn(f).astype(np.float32) * 0.1
    h0 = (rng.randn(n, f).astype(np.float32) * mask).astype(np.float32)
    gru = {"w_ih": rng.randn(f, 3 * f).astype(np.float32) * 0.3,
           "w_hh": rng.randn(f, 3 * f).astype(np.float32) * 0.3,
           "b_ih": rng.randn(3 * f).astype(np.float32) * 0.1,
           "b_hh": rng.randn(3 * f).astype(np.float32) * 0.1}
    ma_bn = {"weight": 1.0 + 0.1 * rng.randn(f).astype(np.float32),
             "bias": 0.1 * rng.randn(f).astype(np.float32)}
    bn = {"weight": 1.0 + 0.1 * rng.randn(f).astype(np.float32),
          "bias": 0.1 * rng.randn(f).astype(np.float32)}
    ro = {"i": {"w": rng.randn(2 * f, od).astype(np.float32) * 0.3,
                "b": rng.randn(od).astype(np.float32) * 0.1},
          "j": {"w": rng.randn(2 * f, od).astype(np.float32) * 0.3,
                "b": rng.randn(od).astype(np.float32) * 0.1}}
    labels = rng.randn(g).astype(np.float32)
    gmask = np.ones(g, np.float32)

    plan = plan_fused_step(src, dst, edge_mask, node_graph, n, g,
                           block_edges=be)
    assert plan is not None
    args = dict(amat=amat, a0=a0, mbias=mbias, h0=h0, mask=mask,
                node_graph=node_graph, gru=gru, ma_bn=ma_bn, bn=bn, ro=ro,
                labels=labels, gmask=gmask, vid=vid, src=src, dst=dst)
    return args, plan, dict(n=n, g=g, f=f, od=od, k=k, steps=steps, be=be)


def as_jnp(args):
    return {kk: jax.tree.map(jnp.asarray, v) for kk, v in args.items()}


@pytest.fixture(scope="module")
def problem():
    return build_problem(np.random.RandomState(0))


def run_kernel(args, plan, dims):
    op = make_fused_step_op(
        dims["steps"], dims["f"], dims["n"], dims["od"], dims["g"],
        dims["k"], block_edges=plan.block_edges, window=plan.window,
        node_window=plan.node_window, interpret=True)
    a = as_jnp(args)
    return op(a["amat"], a["a0"], a["mbias"], a["h0"], a["mask"],
              a["node_graph"], a["gru"], a["ma_bn"], a["bn"], a["ro"],
              a["labels"], a["gmask"], a["vid"], a["src"], a["dst"],
              jnp.asarray(plan.win_start), jnp.asarray(plan.node_start))


def run_reference(args, dims):
    a = as_jnp(args)
    return reference_fused_step(
        a["amat"], a["a0"], a["mbias"], a["h0"], a["mask"],
        a["node_graph"], a["gru"], a["ma_bn"], a["bn"], a["ro"],
        a["labels"], a["gmask"], a["vid"], a["src"], a["dst"],
        steps=dims["steps"])


class TestFusedStepForward:
    @pytest.mark.parametrize("keep_gates", [None, False])
    def test_loss_out_stats(self, problem, keep_gates):
        # keep_gates=False exercises the large-N per-step gate recompute
        # (auto-selected past 16,384 padded nodes; bit-identical math)
        args, plan, dims = problem
        op = make_fused_step_op(
            dims["steps"], dims["f"], dims["n"], dims["od"], dims["g"],
            dims["k"], block_edges=plan.block_edges, window=plan.window,
            node_window=plan.node_window, interpret=True,
            keep_gates=keep_gates)
        a = as_jnp(args)
        loss_k, out_k, ma_k, st_k = op(
            a["amat"], a["a0"], a["mbias"], a["h0"], a["mask"],
            a["node_graph"], a["gru"], a["ma_bn"], a["bn"], a["ro"],
            a["labels"], a["gmask"], a["vid"], a["src"], a["dst"],
            jnp.asarray(plan.win_start), jnp.asarray(plan.node_start))
        loss_r, out_r, ma_r, st_r = run_reference(args, dims)
        np.testing.assert_allclose(loss_k, loss_r, rtol=2e-5)
        np.testing.assert_allclose(out_k, out_r, rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(ma_k[0], ma_r[0], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(ma_k[1], ma_r[1], rtol=1e-5, atol=1e-6)
        for (mk, vk), (mr, vr) in zip(st_k, st_r):
            np.testing.assert_allclose(mk, mr, rtol=2e-5, atol=1e-6)
            np.testing.assert_allclose(vk, vr, rtol=2e-5, atol=1e-6)


@pytest.mark.slow
class TestFusedStepBackward:
    @pytest.fixture(autouse=True, params=["auto", "stream"])
    def _rec_bwd_impl(self, request, monkeypatch):
        # 'stream' forces the streaming merged backward + transposed_io
        # pairing (what batch-4096-scale runs take — the VMEM-resident
        # branch otherwise always wins at test sizes)
        monkeypatch.setenv("MPNN_FS_REC_BWD", request.param)

    def test_all_gradient_leaves(self, problem):
        args, plan, dims = problem
        a = as_jnp(args)
        cw = jnp.asarray(
            np.random.RandomState(7).randn(dims["g"], dims["od"])
            .astype(np.float32))

        op = make_fused_step_op(
            dims["steps"], dims["f"], dims["n"], dims["od"], dims["g"],
            dims["k"], block_edges=plan.block_edges, window=plan.window,
            node_window=plan.node_window, interpret=True)

        diff = (a["amat"], a["a0"], a["mbias"], a["h0"], a["gru"],
                a["ma_bn"], a["bn"], a["ro"])

        def obj_kernel(amat, a0, mbias, h0, gru, ma_bn, bn, ro):
            loss, out, _, _ = op(
                amat, a0, mbias, h0, a["mask"], a["node_graph"], gru,
                ma_bn, bn, ro, a["labels"], a["gmask"], a["vid"], a["src"],
                a["dst"], jnp.asarray(plan.win_start),
                jnp.asarray(plan.node_start))
            return 1.3 * loss + jnp.sum(out * cw)

        def obj_ref(amat, a0, mbias, h0, gru, ma_bn, bn, ro):
            loss, out, _, _ = reference_fused_step(
                amat, a0, mbias, h0, a["mask"], a["node_graph"], gru,
                ma_bn, bn, ro, a["labels"], a["gmask"], a["vid"], a["src"],
                a["dst"], steps=dims["steps"])
            return 1.3 * loss + jnp.sum(out * cw)

        gk = jax.grad(obj_kernel, argnums=tuple(range(8)))(*diff)
        gr = jax.grad(obj_ref, argnums=tuple(range(8)))(*diff)
        flat_k, tk = jax.tree.flatten(gk)
        flat_r, tr = jax.tree.flatten(gr)
        assert tk == tr
        for xk, xr, path in zip(flat_k, flat_r,
                                jax.tree.leaves_with_path(gk, tk)
                                if False else range(len(flat_k))):
            np.testing.assert_allclose(
                np.asarray(xk), np.asarray(xr), rtol=5e-4, atol=5e-5,
                err_msg=f"gradient leaf {path}")


class TestFusedPlan:
    def test_attach_roundtrip(self, problem):
        args, plan, dims = problem
        batch = {
            "edge_src": args["src"], "edge_dst": args["dst"],
            "edge_mask": np.ones(args["src"].shape[0], np.float32),
            "node_graph": args["node_graph"],
            "node_feats": np.zeros((dims["n"], dims["f"]), np.float32),
            "graph_mask": np.ones(dims["g"], np.float32),
        }
        out = attach_fused_plan(batch, block_edges=dims["be"])
        assert "fs_win" in out and "fs_ns" in out
        assert out["fs_window"] % 128 == 0
        assert (np.asarray(out["fs_win"]) % 128 == 0).all()

    def test_plan_declines_nonlocal_edges(self):
        rng = np.random.RandomState(1)
        n = 2048
        src = rng.randint(0, n, 512).astype(np.int32)
        dst = rng.randint(0, n, 512).astype(np.int32)
        ng = np.zeros(n, np.int32)
        plan = plan_fused_step(src, dst, np.ones(512, np.float32), ng,
                               n, 1, block_edges=128)
        assert plan is None


@pytest.mark.slow
class TestFusedFlagshipLoss:
    """End-to-end parity on REAL molecules: the whole-step fused path
    (models/fused_train.py) vs sparse_mpnn_apply (XLA, proven exact vs
    dense) + the same masked-MSE loss. Exercises attach_edge_vocab's
    zero-row convention for padded edges and the host window plans."""

    def _setup(self):
        from mpnn_tpu import graphs as G
        from mpnn_tpu import models
        smiles = ["CCO", "c1ccccc1", "CC(=O)O",
                  "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
                  "CN1C=NC2=C1C(=O)N(C(=O)N2C)C", "C1CCCCC1",
                  "NC(=O)c1ccccc1", "OC(=O)c1ccccc1O"] * 4
        gs = G.generate_molgraphs(smiles, list(range(len(smiles))))
        gs, ge = G.encode_molgraphs(gs)
        nf = ge.atom_width() + 3
        cfg = models.MPNNConfig(
            node_features=nf, edge_features=ge.bond_width(),
            message_features=nf, output_dim=7, message_steps=3,
            msg_norm="bn1d", state_norm="bn1d", edge_mlp_tail_repeats=3)
        params, state = models.mpnn_init(jax.random.PRNGKey(317), cfg)
        packed = G.collate_packed(gs).as_dict()
        packed = G.attach_edge_vocab(packed, vocab_cap=16)
        from mpnn_tpu.kernels.fused_step import attach_fused_plan
        packed = attach_fused_plan(packed, block_edges=128)
        assert "fs_win" in packed
        packed["node_feats"] = np.concatenate(
            [packed["node_feats"], packed["node_nafm"]], axis=-1)
        jb = {kk: jnp.asarray(v) if not np.isscalar(v) else v
              for kk, v in packed.items()}
        labels = jnp.asarray(np.random.RandomState(3).randn(
            packed["graph_mask"].shape[0]).astype(np.float32))
        return cfg, params, state, jb, labels

    def test_loss_and_grads_match_sparse_path(self):
        from mpnn_tpu.models.fused_train import (fused_flagship_loss,
                                                 fused_step_eligible,
                                                 make_fused_step_for_batch)
        from mpnn_tpu.models.sparse import sparse_mpnn_apply
        cfg, params, state, jb, labels = self._setup()
        assert fused_step_eligible(cfg, jb, training=True)
        op = make_fused_step_for_batch(cfg, jb, interpret=True)

        def loss_fused(p, s):
            loss, out, ns = fused_flagship_loss(p, s, cfg, jb, labels, op)
            return loss, (out, ns)

        def loss_ref(p, s):
            out, ns = sparse_mpnn_apply(p, s, cfg, jb, training=True)
            gm = jb["graph_mask"][:, None]
            per = ((out - labels[:, None]) ** 2) * gm
            return per.sum() / gm.sum(), (out, ns)

        (lf, (of, nsf)), gf = jax.value_and_grad(
            loss_fused, has_aux=True)(params, state)
        (lr, (orf, nsr)), gr = jax.value_and_grad(
            loss_ref, has_aux=True)(params, state)
        np.testing.assert_allclose(lf, lr, rtol=2e-5)
        np.testing.assert_allclose(of, orf, rtol=2e-4, atol=1e-5)
        flat_f, tf = jax.tree.flatten(gf)
        flat_r, tr = jax.tree.flatten(gr)
        assert tf == tr
        for i, (xf, xr) in enumerate(zip(flat_f, flat_r)):
            np.testing.assert_allclose(
                np.asarray(xf), np.asarray(xr), rtol=1e-3, atol=1e-5,
                err_msg=f"param-gradient leaf {i}")
        # running-stat EMAs match too
        for kk in ("ma_bn", "bn"):
            for sf, sr in zip(nsf[kk], nsr[kk]):
                for field in ("running_mean", "running_var"):
                    np.testing.assert_allclose(
                        np.asarray(sf[field]), np.asarray(sr[field]),
                        rtol=2e-4, atol=1e-6, err_msg=f"{kk}.{field}")


@pytest.mark.slow
class TestFusedGGNNLoss:
    """GGNN through the SAME whole-step kernel: natively A-form (per
    bond-type matrices, type 0 = zero matrix, a0 = 0). End-to-end parity
    on real molecules vs sparse_mpnn_apply's GGNN branch."""

    def _setup(self):
        from mpnn_tpu import graphs as G
        from mpnn_tpu import models
        smiles = ["CCO", "c1ccccc1", "CC(=O)O",
                  "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
                  "CN1C=NC2=C1C(=O)N(C(=O)N2C)C", "C1CCCCC1",
                  "NC(=O)c1ccccc1", "C#N"] * 4
        gs = G.generate_molgraphs(smiles, list(range(len(smiles))))
        G.attach_edge_types(gs)
        gs, ge = G.encode_molgraphs(gs)
        nf = ge.atom_width() + 3
        cfg = models.MPNNConfig(
            node_features=nf, edge_features=4, ggnn_num_edge_types=4,
            message_features=nf, output_dim=5, message_steps=3,
            message_fn="ggnn", msg_norm="bn1d", state_norm="bn1d")
        params, state = models.mpnn_init(jax.random.PRNGKey(11), cfg)
        packed = G.collate_packed(gs).as_dict()
        packed = G.with_edge_types(packed, gs)
        from mpnn_tpu.kernels.fused_step import attach_fused_plan
        packed = attach_fused_plan(packed, block_edges=128)
        assert "fs_win" in packed
        packed["node_feats"] = np.concatenate(
            [packed["node_feats"], packed["node_nafm"]], axis=-1)
        jb = {kk: jnp.asarray(v) if not np.isscalar(v) else v
              for kk, v in packed.items()}
        labels = jnp.asarray(np.random.RandomState(5).randn(
            packed["graph_mask"].shape[0]).astype(np.float32))
        return cfg, params, state, jb, labels

    def test_loss_and_grads_match_sparse_path(self):
        from mpnn_tpu.models.fused_train import (fused_flagship_loss,
                                                 fused_step_eligible,
                                                 make_fused_step_for_batch)
        from mpnn_tpu.models.sparse import sparse_mpnn_apply
        cfg, params, state, jb, labels = self._setup()
        assert fused_step_eligible(cfg, jb, training=True)
        op = make_fused_step_for_batch(cfg, jb, interpret=True)

        def loss_fused(p, s):
            loss, out, ns = fused_flagship_loss(p, s, cfg, jb, labels, op)
            return loss, (out, ns)

        def loss_ref(p, s):
            out, ns = sparse_mpnn_apply(p, s, cfg, jb, training=True)
            gm = jb["graph_mask"][:, None]
            per = ((out - labels[:, None]) ** 2) * gm
            return per.sum() / gm.sum(), (out, ns)

        (lf, (of, nsf)), gf = jax.value_and_grad(
            loss_fused, has_aux=True)(params, state)
        (lr, (orf, nsr)), gr = jax.value_and_grad(
            loss_ref, has_aux=True)(params, state)
        np.testing.assert_allclose(lf, lr, rtol=2e-5)
        np.testing.assert_allclose(of, orf, rtol=2e-4, atol=1e-5)
        flat_f, tf = jax.tree.flatten(gf)
        flat_r, tr = jax.tree.flatten(gr)
        assert tf == tr
        for i, (xf, xr) in enumerate(zip(flat_f, flat_r)):
            np.testing.assert_allclose(
                np.asarray(xf), np.asarray(xr), rtol=1e-3, atol=1e-5,
                err_msg=f"param-gradient leaf {i}")
        for kk in ("ma_bn", "bn"):
            for sf, sr in zip(nsf[kk], nsr[kk]):
                for field in ("running_mean", "running_var"):
                    np.testing.assert_allclose(
                        np.asarray(sf[field]), np.asarray(sr[field]),
                        rtol=2e-4, atol=1e-6, err_msg=f"{kk}.{field}")

    def test_recurrence_kernel_ggnn_parity(self):
        """The fused-recurrence hook in sparse_mpnn_apply now accepts GGNN
        (step-constant messages): interpret-mode parity vs the step loop."""
        from mpnn_tpu.kernels.recurrence import make_recurrence_op_auto
        from mpnn_tpu.models.sparse import (recurrence_eligible,
                                            sparse_mpnn_apply)
        cfg, params, state, jb, labels = self._setup()
        assert recurrence_eligible(cfg, training=True)
        rec = make_recurrence_op_auto(
            cfg.message_steps, cfg.node_features,
            int(jb["node_feats"].shape[0]), interpret=True)
        out_k, ns_k = sparse_mpnn_apply(params, state, cfg, jb,
                                        training=True, recurrence_fn=rec)
        out_r, ns_r = sparse_mpnn_apply(params, state, cfg, jb,
                                        training=True)
        np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                                   rtol=2e-4, atol=1e-5)


@pytest.mark.slow
class TestFusedMpnnOutInNetwork:
    """fused_mpnn_out inside the FULL network: the REAL lipo-driver shape
    (graph-norm wrapper + MPNN + BatchNorm1d + halving head) with the MPNN
    core as one fused pallas_call and the wrapper/head/loss in XLA. Tight
    loss+grad parity vs the all-XLA network path (the out cotangent drives
    the kernel's custom VJP)."""

    def test_full_network_loss_and_grads(self):
        from mpnn_tpu import graphs as G
        from mpnn_tpu import models
        from mpnn_tpu.kernels.fused_step import attach_fused_plan
        from mpnn_tpu.models.fused_train import (fused_step_eligible,
                                                 make_fused_step_for_batch)
        from mpnn_tpu.models.network import (NetworkConfig,
                                             network_apply_packed,
                                             network_init)
        smiles = ["CCO", "c1ccccc1", "CC(=O)O",
                  "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
                  "CN1C=NC2=C1C(=O)N(C(=O)N2C)C", "C1CCCCC1",
                  "NC(=O)c1ccccc1", "OC(=O)c1ccccc1O"] * 3
        gs = G.generate_molgraphs(smiles, list(range(len(smiles))))
        gs, ge = G.encode_molgraphs(gs)
        nf = ge.atom_width() + 3          # afm + nafm via the wrapper
        mcfg = models.MPNNConfig(
            node_features=nf, edge_features=ge.bond_width(),
            message_features=nf, output_dim=2 * ge.atom_width(),
            message_steps=3, msg_norm="bn1d", state_norm="bn1d",
            edge_mlp_tail_repeats=3)
        ncfg = NetworkConfig(mpnn=mcfg, input_wrapper="graph_norm",
                             nafm_features=3, head="halving",
                             head_output=1, head_bn=True)
        params, state = network_init(jax.random.PRNGKey(7), ncfg)
        packed = G.collate_packed(gs).as_dict()
        packed = G.attach_edge_vocab(packed, vocab_cap=16)
        packed = attach_fused_plan(packed, block_edges=128)
        assert "fs_win" in packed
        jb = {kk: jnp.asarray(v) if not np.isscalar(v) else v
              for kk, v in packed.items()}
        labels = jnp.asarray(np.random.RandomState(9).randn(
            packed["graph_mask"].shape[0]).astype(np.float32))
        assert fused_step_eligible(mcfg, jb, training=True)
        op = make_fused_step_for_batch(mcfg, jb, interpret=True)

        def loss_with(p, s, fused_op):
            out, ns = network_apply_packed(p, s, ncfg, jb, training=True,
                                           fused_op=fused_op)
            gm = jb["graph_mask"][:, None]
            per = ((out - labels[:, None]) ** 2) * gm
            return per.sum() / gm.sum(), (out, ns)

        (lf, (of, nsf)), gf = jax.value_and_grad(
            lambda p, s: loss_with(p, s, op), has_aux=True)(params, state)
        (lr, (orf, nsr)), gr = jax.value_and_grad(
            lambda p, s: loss_with(p, s, None), has_aux=True)(params, state)
        np.testing.assert_allclose(lf, lr, rtol=2e-5)
        np.testing.assert_allclose(of, orf, rtol=2e-4, atol=1e-5)
        flat_f, tf = jax.tree.flatten(gf)
        flat_r, tr = jax.tree.flatten(gr)
        assert tf == tr
        for i, (xf, xr) in enumerate(zip(flat_f, flat_r)):
            np.testing.assert_allclose(
                np.asarray(xf), np.asarray(xr), rtol=2e-3, atol=1e-5,
                err_msg=f"param-gradient leaf {i}")
        # MPNN EMA states and the wrapper/head BN states match
        flat_sf, _ = jax.tree.flatten(nsf)
        flat_sr, _ = jax.tree.flatten(nsr)
        for i, (xf, xr) in enumerate(zip(flat_sf, flat_sr)):
            np.testing.assert_allclose(
                np.asarray(xf), np.asarray(xr), rtol=2e-4, atol=1e-6,
                err_msg=f"state leaf {i}")


@pytest.mark.slow
class TestFusedEval:
    def test_eval_kernel_matches_sparse_eval(self):
        """The whole-step INFERENCE kernel (running-stat BN folded to
        affines) vs sparse_mpnn_apply(training=False) on real molecules,
        after a training step so the running stats are non-trivial."""
        from mpnn_tpu.models.fused_train import (fused_flagship_loss,
                                                 fused_mpnn_eval,
                                                 fused_step_eligible,
                                                 make_fused_eval_for_batch,
                                                 make_fused_step_for_batch)
        from mpnn_tpu.models.sparse import sparse_mpnn_apply
        cfg, params, state, jb, labels = \
            TestFusedFlagshipLoss._setup(TestFusedFlagshipLoss())
        assert fused_step_eligible(cfg, jb, training=True)
        # one training step to move the EMAs off their init
        op = make_fused_step_for_batch(cfg, jb, interpret=True)
        _, _, state = fused_flagship_loss(params, state, cfg, jb,
                                          labels, op)
        ev = make_fused_eval_for_batch(cfg, jb, interpret=True)
        out_k = fused_mpnn_eval(params, state, cfg, jb, ev)
        out_r, _ = sparse_mpnn_apply(params, state, cfg, jb,
                                     training=False)
        np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                                   rtol=2e-4, atol=1e-5)

    def test_eval_kernel_ggnn(self):
        from mpnn_tpu.models.fused_train import (fused_mpnn_eval,
                                                 make_fused_eval_for_batch)
        from mpnn_tpu.models.sparse import sparse_mpnn_apply
        cfg, params, state, jb, labels = \
            TestFusedGGNNLoss._setup(TestFusedGGNNLoss())
        ev = make_fused_eval_for_batch(cfg, jb, interpret=True)
        out_k = fused_mpnn_eval(params, state, cfg, jb, ev)
        out_r, _ = sparse_mpnn_apply(params, state, cfg, jb,
                                     training=False)
        np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                                   rtol=2e-4, atol=1e-5)


class TestLoaderIntegration:
    def test_graphloader_attaches_fused_plan(self):
        from mpnn_tpu import graphs as G
        from mpnn_tpu.graphs.dataloader import GraphLoader
        smiles = ["CCO", "c1ccccc1", "CC(=O)O", "C1CCCCC1",
                  "NC(=O)c1ccccc1"] * 8
        gs = G.generate_molgraphs(smiles, list(range(len(smiles))))
        gs, _ = G.encode_molgraphs(gs)
        loader = GraphLoader(gs, batch_size=16, collate="packed",
                             fused_step_plan=True)
        batches = list(loader)
        assert batches
        for b in batches:
            assert "fs_win" in b and "fs_ns" in b
            assert b["fs_window"] % 128 == 0
            assert b["fs_node_window"] % 128 == 0
        # run-fixed caps => every batch shares ONE compiled shape
        sizes = {(b["fs_window"], b["fs_node_window"],
                  b["fs_win"].shape, b["fs_ns"].shape) for b in batches}
        assert len(sizes) == 1


@pytest.mark.slow
class TestFusedEncodedFamily:
    """VERDICT r2 item 5: the encoded family's input pipeline (frozen-or-
    trainable atom/bond encoders + input BN) folds into XLA preprocessing
    around the unchanged whole-step kernel, and output_norm rides after it
    (fused_mpnn_out). Parity vs sparse_mpnn_apply for loss, grads (incl.
    the encoder weights), and every EMA (aebn/bebn/obn + recurrence).
    Note: the reference encoded EXPERIMENTS use per-step message weights/
    norm pairs, which the kernel does not cover yet — this tests the
    shared-weight encoder composition that IS eligible."""

    def _setup(self, output_norm):
        from mpnn_tpu import graphs as G
        from mpnn_tpu import models
        from mpnn_tpu.kernels.fused_step import attach_fused_plan
        smiles = ["CCO", "c1ccccc1", "CC(=O)O",
                  "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
                  "CN1C=NC2=C1C(=O)N(C(=O)N2C)C", "C1CCCCC1",
                  "NC(=O)c1ccccc1", "OC(=O)c1ccccc1O"] * 4
        gs = G.generate_molgraphs(smiles, list(range(len(smiles))))
        gs, ge = G.encode_molgraphs(gs)
        enc_afm = 8
        cfg = models.MPNNConfig(
            node_features=enc_afm, edge_features=2,
            message_features=enc_afm, output_dim=5, message_steps=3,
            msg_norm="bn1d", state_norm="bn1d", edge_mlp_tail_repeats=2,
            atom_encoder="atom_ae", atom_encoder_in=ge.atom_width(),
            bond_encoder="bond_ae", bond_encoder_in=ge.bond_width(),
            input_norm=True, output_norm=output_norm)
        params, state = models.mpnn_init(jax.random.PRNGKey(21), cfg)
        packed = G.collate_packed(gs).as_dict()
        packed = G.attach_edge_vocab(packed, vocab_cap=16)
        packed = attach_fused_plan(packed, block_edges=128)
        assert "fs_win" in packed
        jb = {kk: jnp.asarray(v) if not np.isscalar(v) else v
              for kk, v in packed.items()}
        labels = jnp.asarray(np.random.RandomState(13).randn(
            packed["graph_mask"].shape[0]).astype(np.float32))
        return cfg, params, state, jb, labels

    def _assert_tree_close(self, a, b, rtol, atol, what):
        fa, ta = jax.tree.flatten(a)
        fb, tb = jax.tree.flatten(b)
        assert ta == tb
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            np.testing.assert_allclose(
                np.asarray(xa), np.asarray(xb), rtol=rtol, atol=atol,
                err_msg=f"{what} leaf {i}")

    def test_inkernel_loss_matches_sparse(self):
        from mpnn_tpu.models.fused_train import (fused_flagship_loss,
                                                 fused_step_eligible,
                                                 make_fused_step_for_batch)
        from mpnn_tpu.models.sparse import sparse_mpnn_apply
        cfg, params, state, jb, labels = self._setup(output_norm=False)
        assert fused_step_eligible(cfg, jb, training=True)
        op = make_fused_step_for_batch(cfg, jb, interpret=True)

        def loss_fused(p, s):
            loss, out, ns = fused_flagship_loss(p, s, cfg, jb, labels, op)
            return loss, (out, ns)

        def loss_ref(p, s):
            out, ns = sparse_mpnn_apply(p, s, cfg, jb, training=True)
            gm = jb["graph_mask"][:, None]
            per = ((out - labels[:, None]) ** 2) * gm
            return per.sum() / gm.sum(), (out, ns)

        (lf, (of, nsf)), gf = jax.value_and_grad(
            loss_fused, has_aux=True)(params, state)
        (lr, (orf, nsr)), gr = jax.value_and_grad(
            loss_ref, has_aux=True)(params, state)
        np.testing.assert_allclose(lf, lr, rtol=2e-5)
        np.testing.assert_allclose(of, orf, rtol=2e-4, atol=1e-5)
        self._assert_tree_close(gf, gr, 2e-3, 1e-5, "grad")
        self._assert_tree_close(nsf, nsr, 2e-4, 1e-6, "state")

    def test_out_flavor_with_output_norm(self):
        from mpnn_tpu.models.fused_train import (fused_mpnn_out,
                                                 fused_step_eligible,
                                                 make_fused_step_for_batch)
        from mpnn_tpu.models.sparse import sparse_mpnn_apply
        cfg, params, state, jb, labels = self._setup(output_norm=True)
        assert fused_step_eligible(cfg, jb, training=True)
        op = make_fused_step_for_batch(cfg, jb, interpret=True)

        def loss_with(p, s, fused):
            if fused:
                out, ns = fused_mpnn_out(p, s, cfg, jb, op)
            else:
                out, ns = sparse_mpnn_apply(p, s, cfg, jb, training=True)
            gm = jb["graph_mask"][:, None]
            per = ((out - labels[:, None]) ** 2) * gm
            return per.sum() / gm.sum(), (out, ns)

        (lf, (of, nsf)), gf = jax.value_and_grad(
            lambda p, s: loss_with(p, s, True), has_aux=True)(params, state)
        (lr, (orf, nsr)), gr = jax.value_and_grad(
            lambda p, s: loss_with(p, s, False), has_aux=True)(params,
                                                               state)
        np.testing.assert_allclose(lf, lr, rtol=2e-5)
        np.testing.assert_allclose(of, orf, rtol=2e-4, atol=1e-5)
        self._assert_tree_close(gf, gr, 2e-3, 1e-5, "grad")
        self._assert_tree_close(nsf, nsr, 2e-4, 1e-6, "state")

    def test_eval_kernel_encoded(self):
        """Serving: encoders + input BN (running stats) + output BN fold
        around the eval kernel; parity vs sparse eval after a training
        step so every EMA is non-trivial."""
        from mpnn_tpu.models.fused_train import (fused_eval_eligible,
                                                 fused_mpnn_eval,
                                                 fused_mpnn_out,
                                                 make_fused_eval_for_batch,
                                                 make_fused_step_for_batch)
        from mpnn_tpu.models.sparse import sparse_mpnn_apply
        cfg, params, state, jb, labels = self._setup(output_norm=True)
        op = make_fused_step_for_batch(cfg, jb, interpret=True)
        _, state = fused_mpnn_out(params, state, cfg, jb, op)
        assert fused_eval_eligible(cfg, jb)
        ev = make_fused_eval_for_batch(cfg, jb, interpret=True)
        out_k = fused_mpnn_eval(params, state, cfg, jb, ev)
        out_r, _ = sparse_mpnn_apply(params, state, cfg, jb,
                                     training=False)
        np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                                   rtol=2e-4, atol=1e-5)
