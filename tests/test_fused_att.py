"""Parity tests for the fused ATT-family kernel (kernels/fused_att.py)
against sparse_mpnn_apply (itself proven exact vs the dense reference
semantics) — VERDICT round-2 item 1. Interpret mode on CPU."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

SMILES = ["CCO", "c1ccccc1", "CC(=O)O", "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
          "CN1C=NC2=C1C(=O)N(C(=O)N2C)C", "C1CCCCC1", "NC(=O)c1ccccc1",
          "OC(=O)c1ccccc1O", "c1ccncc1CCO", "CC(C)(C)NCC(O)c1ccc(O)cc1"] * 3


def _setup(aggregation="att", readout="set2vec", tail=3):
    from mpnn_tpu import graphs as G
    from mpnn_tpu import models
    from mpnn_tpu.kernels.fused_step import attach_fused_plan
    gs = G.generate_molgraphs(SMILES, list(range(len(SMILES))))
    gs, ge = G.encode_molgraphs(gs)
    nf = ge.atom_width() + 3
    cfg = models.MPNNConfig(
        node_features=nf, edge_features=ge.bond_width(),
        message_features=nf, output_dim=4 * nf,
        message_fn="att_edge_network", aggregation=aggregation,
        readout=readout, set2vec_steps=4, update_hidden="initial",
        message_steps=3, edge_mlp_tail_repeats=tail)
    params, state = models.mpnn_init(jax.random.PRNGKey(317), cfg)
    packed = G.collate_packed(gs).as_dict()
    packed = G.attach_edge_vocab(packed, vocab_cap=16)
    packed = attach_fused_plan(packed, block_edges=128)
    assert "fs_win" in packed
    packed["node_feats"] = np.concatenate(
        [packed["node_feats"], packed["node_nafm"]], axis=-1)
    jb = {kk: jnp.asarray(v) if not np.isscalar(v) else v
          for kk, v in packed.items()}
    labels = jnp.asarray(np.random.RandomState(3).randn(
        packed["graph_mask"].shape[0]).astype(np.float32))
    return cfg, params, state, jb, labels


def _tree_close(a, b, rtol, atol, what):
    fa, ta = jax.tree.flatten(a)
    fb, tb = jax.tree.flatten(b)
    assert ta == tb
    for i, (xa, xb) in enumerate(zip(fa, fb)):
        np.testing.assert_allclose(
            np.asarray(xa), np.asarray(xb), rtol=rtol, atol=atol,
            err_msg=f"{what} leaf {i}")


class TestFusedAtt:
    @pytest.mark.parametrize("aggregation", ["att", "adj"])
    def test_loss_and_grads_match_sparse(self, aggregation):
        """Full family parity (the bench 'att' / adv experiment shape):
        gated messages + rank-1 'att' correction + GRU through ONE
        pallas_call fwd + ONE bwd, set2vec in XLA; loss + every gradient
        leaf vs sparse_mpnn_apply."""
        from mpnn_tpu.models.fused_train import (fused_mpnn_out,
                                                 fused_step_eligible,
                                                 make_fused_step_for_batch)
        from mpnn_tpu.models.sparse import sparse_mpnn_apply
        cfg, params, state, jb, labels = _setup(aggregation=aggregation)
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

        (lf, (of, _)), gf = jax.value_and_grad(
            lambda p, s: loss_with(p, s, True), has_aux=True)(params, state)
        (lr, (orf, _)), gr = jax.value_and_grad(
            lambda p, s: loss_with(p, s, False), has_aux=True)(params,
                                                               state)
        np.testing.assert_allclose(lf, lr, rtol=2e-5)
        np.testing.assert_allclose(of, orf, rtol=2e-4, atol=1e-5)
        _tree_close(gf, gr, 2e-3, 1e-5, f"grad[{aggregation}]")

    def test_graph_level_readout_variant(self):
        from mpnn_tpu.models.fused_train import (fused_mpnn_out,
                                                 fused_step_eligible,
                                                 make_fused_step_for_batch)
        from mpnn_tpu.models.sparse import sparse_mpnn_apply
        cfg, params, state, jb, labels = _setup(readout="graph_level")
        assert fused_step_eligible(cfg, jb, training=True)
        op = make_fused_step_for_batch(cfg, jb, interpret=True)
        out_f, _ = fused_mpnn_out(params, state, cfg, jb, op)
        out_r, _ = sparse_mpnn_apply(params, state, cfg, jb, training=True)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                                   rtol=2e-4, atol=1e-5)

    def test_eval_path(self):
        """Serving: the att family's eval IS its train forward (no BN in
        the recurrence) — fused_mpnn_eval vs sparse eval."""
        from mpnn_tpu.models.fused_train import (fused_eval_eligible,
                                                 fused_mpnn_eval,
                                                 make_fused_eval_for_batch)
        from mpnn_tpu.models.sparse import sparse_mpnn_apply
        cfg, params, state, jb, labels = _setup()
        assert fused_eval_eligible(cfg, jb)
        ev = make_fused_eval_for_batch(cfg, jb, interpret=True)
        out_k = fused_mpnn_eval(params, state, cfg, jb, ev)
        out_r, _ = sparse_mpnn_apply(params, state, cfg, jb,
                                     training=False)
        np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                                   rtol=2e-4, atol=1e-5)

    def test_ineligible_shapes_fall_back(self):
        from mpnn_tpu.models.fused_train import fused_step_eligible
        cfg, params, state, jb, labels = _setup()
        for kw in ({"message_input": "state"}, {"msg_norm": "bn1d"}):
            bad = dataclasses.replace(cfg, **kw)
            assert not fused_step_eligible(bad, jb, training=True), kw
        assert not fused_step_eligible(
            dataclasses.replace(cfg, aggregation="wadj"), jb,
            training=True)
        # round 4: update_hidden='state' and per-step message weights are
        # now ELIGIBLE — they route to the T-step kernel
        # (make_fused_att_steps_op; tests/test_fused_norm_modes.py)
        for kw in ({"update_hidden": "state"},
                   {"update_hidden": "state",
                    "share_message_weights": False}):
            good = dataclasses.replace(cfg, **kw)
            assert fused_step_eligible(good, jb, training=True), kw
        # ...but per-step weights with the COLLAPSED 'initial' hidden stay
        # on the XLA path (h_T = GRU(msgs_T, h0); no kernel models it)
        assert not fused_step_eligible(
            dataclasses.replace(cfg, share_message_weights=False), jb,
            training=True)

    def test_trainer_wiring(self):
        """TrainConfig(fuse_step=True) routes the adv-shaped network
        through the att kernel in the production trainer and coarsely
        tracks the XLA path (op-level parity is tight above)."""
        from mpnn_tpu import graphs as G
        from mpnn_tpu import models
        from mpnn_tpu.models.network import NetworkConfig
        from mpnn_tpu.train import trainer
        gs = G.generate_molgraphs(SMILES[:16],
                                  [0.1 * len(s) for s in SMILES[:16]])
        gs, ge = G.encode_molgraphs(gs)
        nf = ge.atom_width()
        mcfg = models.MPNNConfig(
            node_features=nf, edge_features=ge.bond_width(),
            message_features=nf, output_dim=4 * nf,
            message_fn="att_edge_network", aggregation="att",
            readout="set2vec", set2vec_steps=3, update_hidden="initial",
            message_steps=2, edge_mlp_tail_repeats=2)
        cfg = NetworkConfig(mpnn=mcfg, input_wrapper="plain",
                            head="linear", head_output=1,
                            kaiming_head=False)
        losses = {}
        for fuse in (False, True):
            tcfg = trainer.TrainConfig(
                epochs=2, batch_size=4, learning_rate=1e-3, loss="mse",
                packed=True, fuse_step=fuse,
                spmm="kernel_interpret" if fuse else "xla",
                seed=317, shuffle=False, log_path=None)
            _, _, _, h = trainer.train(cfg, tcfg, gs, with_nafm=False)
            losses[fuse] = [r["train_loss"] for r in h]
        np.testing.assert_allclose(losses[True][0], losses[False][0],
                                   rtol=5e-3)
        np.testing.assert_allclose(losses[True], losses[False], rtol=0.25)


class TestSet2VecKernel:
    @pytest.mark.parametrize("batch_softmax,steps",
                             [(True, 6), (False, 6), (True, 12)])
    def test_forward_and_grads_match_sparse(self, batch_softmax, steps):
        """The fused set2vec readout kernel (kernels/set2vec.py) vs
        sparse_set2vec: values + gradients in rparams and x — BOTH
        softmax modes (batch-global = the reference quirk; per-graph =
        the sane default, block-local in-kernel). steps=12 crosses the
        gridded kernel's 8-row att-window boundary (fwd index map t//8 +
        re-zeroing at rem(t,8)==0; bwd reversed map) — the production
        T=12 / reference T=100 path (review finding: T=6 stays inside
        one window)."""
        from mpnn_tpu import graphs as G
        from mpnn_tpu.kernels.fused_step import attach_fused_plan
        from mpnn_tpu.kernels.set2vec import make_set2vec_op
        from mpnn_tpu.models.sparse import sparse_set2vec
        from mpnn_tpu.ops.readout import set2vec_init
        gs = G.generate_molgraphs(SMILES, list(range(len(SMILES))))
        gs, ge = G.encode_molgraphs(gs)
        packed = G.collate_packed(gs).as_dict()
        packed = G.attach_edge_vocab(packed, vocab_cap=16)
        packed = attach_fused_plan(packed, block_edges=128)
        n = packed["node_feats"].shape[0]
        g = packed["graph_mask"].shape[0]
        nf = 7
        w = 2 * nf
        rng = np.random.RandomState(11)
        x = jnp.asarray((rng.randn(n, w)
                         * packed["node_mask"]).astype(np.float32))
        rparams = set2vec_init(jax.random.PRNGKey(5), nf, time_steps=steps)
        mask = jnp.asarray(packed["node_mask"])
        ngr = jnp.asarray(packed["node_graph"])
        ns = jnp.asarray(packed["fs_ns"])
        op = make_set2vec_op(w, n, g, time_steps=steps,
                             node_window=int(packed["fs_node_window"]),
                             interpret=True,
                             batch_softmax=batch_softmax)

        def out_k(rp, xx):
            return op(rp, xx, mask, ngr, ns)

        def out_r(rp, xx):
            return sparse_set2vec(rp, xx, mask, ngr, g, time_steps=steps,
                                  batch_softmax=batch_softmax)

        ok = out_k(rparams, x)
        orf = out_r(rparams, x)
        np.testing.assert_allclose(np.asarray(ok), np.asarray(orf),
                                   rtol=2e-4, atol=1e-5)
        co = jnp.asarray(rng.randn(*ok.shape).astype(np.float32))

        def loss_k(rp, xx):
            return (out_k(rp, xx) * co).sum()

        def loss_r(rp, xx):
            return (out_r(rp, xx) * co).sum()

        gk = jax.grad(loss_k, argnums=(0, 1))(rparams, x)
        gr = jax.grad(loss_r, argnums=(0, 1))(rparams, x)
        _tree_close(gk, gr, 2e-3, 1e-5, "set2vec grad")
