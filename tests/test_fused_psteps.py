"""Parity tests for the PER-STEP-parameter whole-step kernel
(kernels/fused_psteps.py) — the encoded family's shape (round-2 VERDICT
item 5's remaining half: encoded_classification/encoded_affinity now pass
fused_step_eligible and train fused). Interpret mode on CPU, vs
sparse_mpnn_apply (proven exact vs the dense reference semantics)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

SMILES = ["CCO", "c1ccccc1", "CC(=O)O", "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
          "CN1C=NC2=C1C(=O)N(C(=O)N2C)C", "C1CCCCC1", "NC(=O)c1ccccc1",
          "OC(=O)c1ccccc1O", "CCN", "CC(C)O"] * 3


def _setup(encoders=True, output_norm=False, steps=3):
    """The REAL encoded model shape (zoo 'encoded'): per-step message
    weights, per-step bn1d pairs, frozen AE encoders + input norm."""
    from mpnn_tpu import graphs as G
    from mpnn_tpu import models
    from mpnn_tpu.kernels.fused_step import attach_fused_plan
    gs = G.generate_molgraphs(SMILES, list(range(len(SMILES))))
    gs, ge = G.encode_molgraphs(gs)
    enc_afm = 8
    kw = {}
    if encoders:
        kw = dict(atom_encoder="atom_ae", atom_encoder_in=ge.atom_width(),
                  bond_encoder="bond_ae", bond_encoder_in=ge.bond_width(),
                  input_norm=True)
        nf, ef = enc_afm, 2
    else:
        nf, ef = ge.atom_width(), ge.bond_width()
    cfg = models.MPNNConfig(
        node_features=nf, edge_features=ef, message_features=nf,
        output_dim=2 * enc_afm, message_steps=steps,
        share_message_weights=False, per_step_norms=True,
        msg_norm="bn1d", state_norm="bn1d", edge_mlp_tail_repeats=2,
        output_norm=output_norm, **kw)
    params, state = models.mpnn_init(jax.random.PRNGKey(317), cfg)
    packed = G.collate_packed(gs).as_dict()
    packed = G.attach_edge_vocab(packed, vocab_cap=16)
    packed = attach_fused_plan(packed, block_edges=128)
    assert "fs_win" in packed
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


class TestFusedPsteps:
    @pytest.mark.parametrize("encoders", [False, True])
    def test_inkernel_loss_grads_and_emas(self, encoders):
        from mpnn_tpu.models.fused_train import (fused_flagship_loss,
                                                 fused_step_eligible,
                                                 make_fused_step_for_batch)
        from mpnn_tpu.models.sparse import sparse_mpnn_apply
        cfg, params, state, jb, labels = _setup(encoders=encoders)
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
        _tree_close(gf, gr, 2e-3, 2e-5, f"grad[enc={encoders}]")
        _tree_close(nsf, nsr, 2e-4, 1e-6, "state")

    def test_out_flavor_with_output_norm(self):
        from mpnn_tpu.models.fused_train import (fused_mpnn_out,
                                                 fused_step_eligible,
                                                 make_fused_step_for_batch)
        from mpnn_tpu.models.sparse import sparse_mpnn_apply
        cfg, params, state, jb, labels = _setup(output_norm=True)
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
            lambda p, s: loss_with(p, s, True), has_aux=True)(params,
                                                              state)
        (lr, (orf, nsr)), gr = jax.value_and_grad(
            lambda p, s: loss_with(p, s, False), has_aux=True)(params,
                                                               state)
        np.testing.assert_allclose(lf, lr, rtol=2e-5)
        # atol 1e-4: the per-step message_bias leaves are mathematically
        # ZERO gradients under the message BN (CLAUDE.md numerical traps)
        # — both sides are float noise at ~1e-5
        _tree_close(gf, gr, 2e-3, 1e-4, "grad")
        _tree_close(nsf, nsr, 2e-4, 1e-6, "state")

    @pytest.mark.parametrize("encoders", [False, True])
    def test_eval_kernel_parity(self, encoders):
        """The per-step INFERENCE kernel (make_fused_psteps_eval_op) vs
        sparse_mpnn_apply(training=False) — after one REAL train step so
        every per-step norm's EMA is non-trivial."""
        from mpnn_tpu.models.fused_train import (fused_eval_eligible,
                                                 fused_flagship_loss,
                                                 fused_mpnn_eval,
                                                 make_fused_eval_for_batch,
                                                 make_fused_step_for_batch)
        from mpnn_tpu.models.sparse import sparse_mpnn_apply
        cfg, params, state, jb, labels = _setup(encoders=encoders)
        assert fused_eval_eligible(cfg, jb)
        train_op = make_fused_step_for_batch(cfg, jb, interpret=True)
        _, _, state = fused_flagship_loss(params, state, cfg, jb, labels,
                                          train_op)
        eval_op = make_fused_eval_for_batch(cfg, jb, interpret=True)
        out_k = fused_mpnn_eval(params, state, cfg, jb, eval_op)
        out_r, _ = sparse_mpnn_apply(params, state, cfg, jb,
                                     training=False)
        np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                                   rtol=2e-4, atol=1e-5)

    def test_eval_trainer_selects_kernel(self):
        """eval_step_for_batch picks the fused serving step (NOT the XLA
        make_eval_step) for the per-step family."""
        from mpnn_tpu.models.fused_train import fused_eval_eligible
        from mpnn_tpu.train import trainer
        from mpnn_tpu.models.network import NetworkConfig
        cfg, params, state, jb, labels = _setup()
        assert fused_eval_eligible(cfg, jb)
        ncfg = NetworkConfig(mpnn=cfg, input_wrapper="plain", head="none")
        step = trainer.eval_step_for_batch(ncfg, "mse", jb,
                                           fuse_eval=True, interpret=True)
        assert step is not trainer.make_eval_step(ncfg, "mse")
        xla = trainer.eval_step_for_batch(ncfg, "mse", jb,
                                          fuse_eval=False)
        assert xla is trainer.make_eval_step(ncfg, "mse")

    def test_encoded_experiments_now_eligible(self):
        """The VERDICT's literal 'Done': the encoded_classification /
        encoded_affinity experiment configs pass fused_step_eligible."""
        from mpnn_tpu import graphs as G
        from mpnn_tpu.kernels.fused_step import attach_fused_plan
        from mpnn_tpu.models import build
        from mpnn_tpu.models.fused_train import fused_step_eligible
        from mpnn_tpu.train import experiments
        gs = G.generate_molgraphs(SMILES, list(range(len(SMILES))))
        gs, ge = G.encode_molgraphs(gs)
        packed = G.attach_edge_vocab(G.collate_packed(gs).as_dict(),
                                     vocab_cap=16)
        packed = attach_fused_plan(packed, block_edges=128)
        for name in ("encoded_classification", "encoded_affinity"):
            exp = experiments.get(name)
            ncfg = build(exp.model, afm=ge.atom_width(),
                         bfm=ge.bond_width(), nafm=3, n_out=4)
            assert fused_step_eligible(ncfg.mpnn, packed, training=True), \
                name

    def test_trainer_wiring_encoded(self):
        """TrainConfig(fuse_step=True) trains the encoded network shape
        (linear head, CE loss) through the psteps kernel and coarsely
        tracks the XLA path."""
        from mpnn_tpu import graphs as G
        from mpnn_tpu.models import build
        from mpnn_tpu.train import trainer
        gs = G.generate_molgraphs(SMILES[:16],
                                  [int("N" in s) for s in SMILES[:16]])
        gs, ge = G.encode_molgraphs(gs)
        cfg = build("encoded", afm=ge.atom_width(), bfm=ge.bond_width(),
                    nafm=3, n_out=2)
        cfg = dataclasses.replace(cfg, mpnn=dataclasses.replace(
            cfg.mpnn, edge_mlp_tail_repeats=2))
        losses = {}
        for fuse in (False, True):
            tcfg = trainer.TrainConfig(
                epochs=2, batch_size=4, learning_rate=1e-3, loss="ce",
                packed=True, fuse_step=fuse,
                spmm="kernel_interpret" if fuse else "xla",
                seed=317, shuffle=False, log_path=None)
            _, _, _, h = trainer.train(cfg, tcfg, gs, with_nafm=False)
            losses[fuse] = [r["train_loss"] for r in h]
        np.testing.assert_allclose(losses[True][0], losses[False][0],
                                   rtol=5e-3)
        np.testing.assert_allclose(losses[True], losses[False], rtol=0.30)


class TestStreamingBwd:
    """The node-blocked streaming backward (round 5: _ps_stream_walk_kernel
    + _ps_msg_bwd_kernel, auto-selected past PS_MONO_BWD_NPAD_CAP) must
    produce the monolithic backward's gradients bit-for-allclose at small
    shapes, across the family's norm modes."""

    @pytest.mark.parametrize("msg_norm,state_norm",
                             [("bn1d", "bn1d"), ("none", "stateless"),
                              ("bn1d", "none"), ("none", "none")])
    def test_streaming_matches_monolith(self, msg_norm, state_norm,
                                        monkeypatch):
        from mpnn_tpu.models.fused_train import (fused_flagship_loss,
                                                 make_fused_step_for_batch)
        cfg, params, state, jb, labels = _setup(encoders=False)
        cfg = dataclasses.replace(cfg, msg_norm=msg_norm,
                                  state_norm=state_norm,
                                  per_step_norms=msg_norm == "bn1d"
                                  or state_norm == "bn1d")

        def grads():
            op = make_fused_step_for_batch(cfg, jb, interpret=True)

            def loss_fused(p, s):
                loss, out, ns = fused_flagship_loss(p, s, cfg, jb,
                                                    labels, op)
                return loss, (out, ns)

            return jax.value_and_grad(loss_fused, has_aux=True)(
                params, state)

        monkeypatch.delenv("MPNN_PS_BWD", raising=False)
        (lm, (om, nsm)), gm = grads()
        monkeypatch.setenv("MPNN_PS_BWD", "stream")
        (ls, (os_, nss)), gs = grads()
        np.testing.assert_allclose(ls, lm, rtol=1e-6)
        _tree_close(gs, gm,  1e-4, 1e-6,
                    f"stream grad[{msg_norm},{state_norm}]")
        _tree_close(nss, nsm, 1e-6, 1e-8, "stream state")

    def test_streaming_multiblock_matches_monolith(self, monkeypatch):
        """Force a tiny node block (MPNN_PS_STREAM_BLK=128) and a multi-
        graph-block batch so the cross-block machinery — accS/accM phase
        barriers over b, per-block gh write-back ordering, the A0
        backward's (2T+1, gb) phase grid — is gradient-compared against
        the monolith (review finding: the default test shapes collapse
        to one node block and one graph block)."""
        from mpnn_tpu import graphs as G
        from mpnn_tpu import models
        from mpnn_tpu.kernels.fused_step import attach_fused_plan
        from mpnn_tpu.models.fused_train import (fused_flagship_loss,
                                                 make_fused_step_for_batch)
        gs = G.generate_molgraphs(SMILES * 5, list(range(len(SMILES) * 5)))
        gs, ge = G.encode_molgraphs(gs)      # 150 graphs -> gb > 1
        cfg = models.MPNNConfig(
            node_features=ge.atom_width(), edge_features=ge.bond_width(),
            message_features=ge.atom_width(), output_dim=6,
            message_steps=2, share_message_weights=False,
            per_step_norms=True, msg_norm="bn1d", state_norm="bn1d",
            edge_mlp_tail_repeats=2)
        params, state = models.mpnn_init(jax.random.PRNGKey(317), cfg)
        packed = G.collate_packed(gs).as_dict()
        packed = G.attach_edge_vocab(packed, vocab_cap=16)
        packed = attach_fused_plan(packed, block_edges=128)
        jb = {kk: jnp.asarray(v) if not np.isscalar(v) else v
              for kk, v in packed.items()}
        assert packed["graph_mask"].shape[0] > 128    # gb > 1
        labels = jnp.asarray(np.random.RandomState(3).randn(
            packed["graph_mask"].shape[0]).astype(np.float32))

        def grads():
            op = make_fused_step_for_batch(cfg, jb, interpret=True)

            def loss_fused(p, s):
                loss, out, ns = fused_flagship_loss(p, s, cfg, jb,
                                                    labels, op)
                return loss, (out, ns)

            return jax.value_and_grad(loss_fused, has_aux=True)(
                params, state)

        monkeypatch.delenv("MPNN_PS_BWD", raising=False)
        (lm, _), gm = grads()
        monkeypatch.setenv("MPNN_PS_BWD", "stream")
        monkeypatch.setenv("MPNN_PS_STREAM_BLK", "128")   # many blocks
        (ls, _), gs_ = grads()
        np.testing.assert_allclose(ls, lm, rtol=1e-6)
        _tree_close(gs_, gm, 1e-4, 1e-6, "stream multiblock grad")
