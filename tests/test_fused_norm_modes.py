"""Norm-mode generalization of the whole-step fused kernel
(kernels/fused_step.py msg_norm/state_norm ∈ {bn1d, none} ×
{bn1d, stateless, none}) — the round-3 verdict's top item: the no-norm
basic family (reference basic_model.py:34-58, used by test.py /
test_single_target.py / basic_graph_autoencoder.py) and the stateless
MaskBatchNorm flavor now ride the SAME whole-step kernel as the flagship.

Parity in interpret mode against sparse_mpnn_apply (itself dense-parity
tested): loss, out, every gradient leaf, EMA state, and the serving
(eval) kernel."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

SMILES = ["CCO", "c1ccccc1", "CC(=O)O", "CCN", "CC(C)O",
          "NC(=O)c1ccccc1", "CCCN", "OC(=O)c1ccccc1O", "CCOC", "CCCC",
          "CC(C)Cc1ccc(cc1)C(C)C(=O)O", "c1ccccc1N"]


def _setup(msg_norm, state_norm, message_fn="edge_network"):
    from mpnn_tpu import graphs as G
    from mpnn_tpu import models
    from mpnn_tpu.kernels.fused_step import attach_fused_plan
    raw = G.generate_molgraphs(SMILES, [0.1 * len(s) for s in SMILES])
    kw = {}
    if message_fn == "ggnn":
        raw = G.attach_edge_types(raw)
        kw = dict(ggnn_num_edge_types=4, edge_features=4)
    gs, ge = G.encode_molgraphs(raw)
    nf = ge.atom_width()
    cfg = models.MPNNConfig(
        node_features=nf,
        edge_features=kw.pop("edge_features", ge.bond_width()),
        message_features=nf, output_dim=3, message_steps=3,
        message_fn=message_fn, msg_norm=msg_norm, state_norm=state_norm,
        edge_mlp_tail_repeats=2, **kw)
    params, state = models.mpnn_init(jax.random.PRNGKey(1), cfg)
    packed = G.collate_packed(gs).as_dict()
    if message_fn == "ggnn":
        packed = G.with_edge_types(packed, gs)
    packed = G.attach_edge_vocab(packed, vocab_cap=16)
    packed = attach_fused_plan(packed, block_edges=128)
    assert "fs_win" in packed
    jb = {k: jnp.asarray(v) if not np.isscalar(v) else v
          for k, v in packed.items()}
    labels = jnp.asarray(np.random.RandomState(0).randn(
        packed["graph_mask"].shape[0]).astype(np.float32))
    return cfg, params, state, jb, labels


MODES = [("none", "none"),          # basic / single_target / autoencoder
         ("none", "stateless"),
         ("bn1d", "none"),
         ("bn1d", "stateless"),
         ("bn1d", "bn1d")]          # flagship regression guard


class TestNormModeParity:
    @pytest.mark.parametrize("msg_norm,state_norm", MODES)
    def test_train_loss_grads_state(self, msg_norm, state_norm):
        from mpnn_tpu.models.fused_train import (fused_flagship_loss,
                                                 fused_step_eligible,
                                                 make_fused_step_for_batch)
        from mpnn_tpu.models.sparse import sparse_mpnn_apply
        cfg, params, state, jb, labels = _setup(msg_norm, state_norm)
        assert fused_step_eligible(cfg, jb, training=True)
        op = make_fused_step_for_batch(cfg, jb, interpret=True)

        def loss_k(p, s):
            l, out, ns = fused_flagship_loss(p, s, cfg, jb, labels, op)
            return l, (out, ns)

        def loss_r(p, s):
            out, ns = sparse_mpnn_apply(p, s, cfg, jb, training=True)
            per = ((out - labels[:, None]) ** 2) * jb["graph_mask"][:, None]
            return per.sum() / jb["graph_mask"].sum(), (out, ns)

        (lk, (ok_, nsk)), gk = jax.value_and_grad(
            loss_k, has_aux=True)(params, state)
        (lr, (or_, nsr)), gr = jax.value_and_grad(
            loss_r, has_aux=True)(params, state)
        np.testing.assert_allclose(float(lk), float(lr), rtol=2e-5)
        np.testing.assert_allclose(np.asarray(ok_), np.asarray(or_),
                                   rtol=2e-4, atol=1e-5)
        fk, tk = jax.tree.flatten(gk)
        fr, tr = jax.tree.flatten(gr)
        assert tk == tr
        for i, (a, b) in enumerate(zip(fk, fr)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=3e-4, atol=2e-5,
                err_msg=f"grad leaf {i}")
        fk, tk = jax.tree.flatten(nsk)
        fr, tr = jax.tree.flatten(nsr)
        assert tk == tr
        for a, b in zip(fk, fr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-6)

    @pytest.mark.parametrize("msg_norm,state_norm",
                             [("none", "none"), ("none", "stateless"),
                              ("bn1d", "none")])
    def test_eval_kernel(self, msg_norm, state_norm):
        from mpnn_tpu.models.fused_train import (fused_eval_eligible,
                                                 fused_mpnn_eval,
                                                 make_fused_eval_for_batch)
        from mpnn_tpu.models.sparse import sparse_mpnn_apply
        cfg, params, state, jb, _ = _setup(msg_norm, state_norm)
        assert fused_eval_eligible(cfg, jb)
        ev = make_fused_eval_for_batch(cfg, jb, interpret=True)
        out_k = fused_mpnn_eval(params, state, cfg, jb, ev)
        out_r, _ = sparse_mpnn_apply(params, state, cfg, jb,
                                     training=False)
        np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                                   rtol=2e-4, atol=1e-5)

    def test_ggnn_no_norms(self):
        """GGNN messages with no norms (the basic shape on the GGNN
        message family) ride the same generalized kernel."""
        from mpnn_tpu.models.fused_train import (fused_flagship_loss,
                                                 fused_step_eligible,
                                                 make_fused_step_for_batch)
        from mpnn_tpu.models.sparse import sparse_mpnn_apply
        cfg, params, state, jb, labels = _setup("none", "none",
                                                message_fn="ggnn")
        assert fused_step_eligible(cfg, jb, training=True)
        op = make_fused_step_for_batch(cfg, jb, interpret=True)
        lk, ok_, _ = fused_flagship_loss(params, state, cfg, jb, labels,
                                         op)
        out_r, _ = sparse_mpnn_apply(params, state, cfg, jb,
                                     training=True)
        per = ((out_r - labels[:, None]) ** 2) * jb["graph_mask"][:, None]
        lr = per.sum() / jb["graph_mask"].sum()
        np.testing.assert_allclose(float(lk), float(lr), rtol=2e-5)
        np.testing.assert_allclose(np.asarray(ok_), np.asarray(out_r),
                                   rtol=2e-4, atol=1e-5)


def _setup_psteps(msg_norm, state_norm, per_step_norms,
                  output_norm=False):
    """Per-step-message family shapes (kernels/fused_psteps.py):
    graph_norm = msg 'none' + state 'stateless' (normed_basic_model.py),
    encoded_ecfp = per-step msg bn1d + state 'none' + output BN."""
    from mpnn_tpu import graphs as G
    from mpnn_tpu import models
    from mpnn_tpu.kernels.fused_step import attach_fused_plan
    gs, ge = G.encode_molgraphs(G.generate_molgraphs(
        SMILES, [0.1 * len(s) for s in SMILES]))
    nf = ge.atom_width()
    cfg = models.MPNNConfig(
        node_features=nf, edge_features=ge.bond_width(),
        message_features=nf, output_dim=3, message_steps=3,
        share_message_weights=False, per_step_norms=per_step_norms,
        msg_norm=msg_norm, state_norm=state_norm,
        output_norm=output_norm, edge_mlp_tail_repeats=2)
    params, state = models.mpnn_init(jax.random.PRNGKey(1), cfg)
    packed = G.collate_packed(gs).as_dict()
    packed = G.attach_edge_vocab(packed, vocab_cap=16)
    packed = attach_fused_plan(packed, block_edges=128)
    jb = {k: jnp.asarray(v) if not np.isscalar(v) else v
          for k, v in packed.items()}
    labels = jnp.asarray(np.random.RandomState(0).randn(
        packed["graph_mask"].shape[0]).astype(np.float32))
    return cfg, params, state, jb, labels


PSTEPS_MODES = [
    ("none", "stateless", False, False),    # graph_norm
    ("bn1d", "none", True, False),          # encoded_ecfp minus obn
    ("bn1d", "none", True, True),           # encoded_ecfp
    ("none", "none", False, False),
    ("bn1d", "bn1d", True, False),          # encoded regression guard
]


class TestPstepsNormModes:
    @pytest.mark.parametrize("msg_norm,state_norm,psn,obn", PSTEPS_MODES)
    def test_train_and_eval_parity(self, msg_norm, state_norm, psn, obn):
        from mpnn_tpu.models.fused_train import (fused_eval_eligible,
                                                 fused_flagship_loss,
                                                 fused_mpnn_eval,
                                                 fused_mpnn_out,
                                                 fused_step_eligible,
                                                 make_fused_eval_for_batch,
                                                 make_fused_step_for_batch)
        from mpnn_tpu.models.sparse import sparse_mpnn_apply
        cfg, params, state, jb, labels = _setup_psteps(
            msg_norm, state_norm, psn, obn)
        assert fused_step_eligible(cfg, jb, training=True)
        op = make_fused_step_for_batch(cfg, jb, interpret=True)

        if obn:
            def loss_k(p, s):
                out, ns = fused_mpnn_out(p, s, cfg, jb, op)
                per = ((out - labels[:, None]) ** 2) \
                    * jb["graph_mask"][:, None]
                return per.sum() / jb["graph_mask"].sum(), (out, ns)
        else:
            def loss_k(p, s):
                l, out, ns = fused_flagship_loss(p, s, cfg, jb, labels,
                                                 op)
                return l, (out, ns)

        def loss_r(p, s):
            out, ns = sparse_mpnn_apply(p, s, cfg, jb, training=True)
            per = ((out - labels[:, None]) ** 2) * jb["graph_mask"][:, None]
            return per.sum() / jb["graph_mask"].sum(), (out, ns)

        (lk, (_, nsk)), gk = jax.value_and_grad(
            loss_k, has_aux=True)(params, state)
        (lr, (_, nsr)), gr = jax.value_and_grad(
            loss_r, has_aux=True)(params, state)
        np.testing.assert_allclose(float(lk), float(lr), rtol=2e-5)
        fk, tk = jax.tree.flatten(gk)
        fr, tr = jax.tree.flatten(gr)
        assert tk == tr
        for i, (a, b) in enumerate(zip(fk, fr)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=3e-4, atol=2e-5,
                err_msg=f"grad leaf {i}")
        fk, tk = jax.tree.flatten(nsk)
        fr, tr = jax.tree.flatten(nsr)
        assert tk == tr
        for a, b in zip(fk, fr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-6)
        assert fused_eval_eligible(cfg, jb)
        ev = make_fused_eval_for_batch(cfg, jb, interpret=True)
        out_e = fused_mpnn_eval(params, state, cfg, jb, ev)
        out_er, _ = sparse_mpnn_apply(params, state, cfg, jb,
                                      training=False)
        np.testing.assert_allclose(np.asarray(out_e), np.asarray(out_er),
                                   rtol=2e-4, atol=1e-5)


def _setup_att_steps(share, state_norm, agg, readout):
    """T-step att-family shapes (kernels/fused_att.py::
    make_fused_att_steps_op): the att_model reference shape is per-step
    message fns + adj aggregation + stateless BN + set2vec
    (models/att_model.py:6-59)."""
    from mpnn_tpu import graphs as G
    from mpnn_tpu import models
    from mpnn_tpu.kernels.fused_step import attach_fused_plan
    gs, ge = G.encode_molgraphs(G.generate_molgraphs(
        SMILES, [0.1 * len(s) for s in SMILES]))
    nf = ge.atom_width()
    cfg = models.MPNNConfig(
        node_features=nf, edge_features=ge.bond_width(),
        message_features=nf, output_dim=3, message_steps=3,
        message_fn="att_edge_network", aggregation=agg,
        share_message_weights=share, update_hidden="state",
        state_norm=state_norm, readout=readout, set2vec_steps=6,
        edge_mlp_tail_repeats=2)
    params, state = models.mpnn_init(jax.random.PRNGKey(1), cfg)
    packed = G.collate_packed(gs).as_dict()
    packed = G.attach_edge_vocab(packed, vocab_cap=16)
    packed = attach_fused_plan(packed, block_edges=128)
    jb = {k: jnp.asarray(v) if not np.isscalar(v) else v
          for k, v in packed.items()}
    labels = jnp.asarray(np.random.RandomState(0).randn(
        packed["graph_mask"].shape[0]).astype(np.float32))
    return cfg, params, state, jb, labels


ATT_STEPS_MODES = [
    (False, "stateless", "adj", "set2vec"),   # the att_model shape
    (False, "none", "adj", "graph_level"),
    (True, "stateless", "adj", "graph_level"),
    (False, "stateless", "att", "graph_level"),
]


class TestAttStepsNormModes:
    @pytest.mark.parametrize("share,state_norm,agg,readout",
                             ATT_STEPS_MODES)
    def test_train_and_eval_parity(self, share, state_norm, agg, readout):
        from mpnn_tpu.models.fused_train import (fused_mpnn_eval,
                                                 fused_mpnn_out,
                                                 fused_step_eligible,
                                                 make_fused_eval_for_batch,
                                                 make_fused_step_for_batch)
        from mpnn_tpu.models.sparse import sparse_mpnn_apply
        cfg, params, state, jb, labels = _setup_att_steps(
            share, state_norm, agg, readout)
        assert fused_step_eligible(cfg, jb, training=True)
        op = make_fused_step_for_batch(cfg, jb, interpret=True)

        def loss_k(p, s):
            out, ns = fused_mpnn_out(p, s, cfg, jb, op)
            per = ((out - labels[:, None]) ** 2) * jb["graph_mask"][:, None]
            return per.sum() / jb["graph_mask"].sum(), (out, ns)

        def loss_r(p, s):
            out, ns = sparse_mpnn_apply(p, s, cfg, jb, training=True)
            per = ((out - labels[:, None]) ** 2) * jb["graph_mask"][:, None]
            return per.sum() / jb["graph_mask"].sum(), (out, ns)

        (lk, _), gk = jax.value_and_grad(loss_k, has_aux=True)(params,
                                                               state)
        (lr, _), gr = jax.value_and_grad(loss_r, has_aux=True)(params,
                                                               state)
        np.testing.assert_allclose(float(lk), float(lr), rtol=3e-5)
        fk, tk = jax.tree.flatten(gk)
        fr, tr = jax.tree.flatten(gr)
        assert tk == tr
        for i, (a, b) in enumerate(zip(fk, fr)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=3e-5,
                err_msg=f"grad leaf {i}")
        ev = make_fused_eval_for_batch(cfg, jb, interpret=True)
        out_e = fused_mpnn_eval(params, state, cfg, jb, ev)
        out_er, _ = sparse_mpnn_apply(params, state, cfg, jb,
                                      training=False)
        np.testing.assert_allclose(np.asarray(out_e), np.asarray(out_er),
                                   rtol=3e-4, atol=2e-5)


class TestZooConfigsEligible:
    def test_basic_single_target_autoencoder_fuse(self):
        """The VERDICT's literal 'Done': the basic / single_target /
        autoencoder zoo configs pass fused_step_eligible."""
        from mpnn_tpu import graphs as G
        from mpnn_tpu.kernels.fused_step import attach_fused_plan
        from mpnn_tpu.models import zoo
        from mpnn_tpu.models.fused_train import fused_step_eligible
        gs, ge = G.encode_molgraphs(G.generate_molgraphs(
            SMILES, list(range(len(SMILES)))))
        packed = G.collate_packed(gs).as_dict()
        packed = G.attach_edge_vocab(packed, vocab_cap=16)
        packed = attach_fused_plan(packed, block_edges=128)
        for name in ("basic", "single_target", "autoencoder",
                     "graph_norm", "att"):
            net = zoo.build(name, afm=ge.atom_width(),
                            bfm=ge.bond_width())
            assert fused_step_eligible(net.mpnn, packed, training=True), \
                name

    def test_trainer_selects_fused_for_basic(self):
        """End-to-end: the basic config (CE loss + linear head) trains
        through the fused whole-step kernel via fused_mpnn_out."""
        from mpnn_tpu import graphs as G
        from mpnn_tpu.models import zoo
        from mpnn_tpu.train import trainer
        gs, ge = G.encode_molgraphs(G.generate_molgraphs(
            SMILES, [i % 3 for i in range(len(SMILES))]))
        net = zoo.build("basic", afm=ge.atom_width(), bfm=ge.bond_width(),
                        n_out=3)
        net = dataclasses.replace(
            net, mpnn=dataclasses.replace(net.mpnn,
                                          edge_mlp_tail_repeats=2))
        tcfg = trainer.TrainConfig(
            epochs=2, batch_size=len(SMILES), learning_rate=1e-2,
            loss="ce", packed=True, fuse_step=True,
            spmm="kernel_interpret", seed=317, shuffle=False,
            log_path=None)
        _, _, _, hist = trainer.train(net, tcfg, gs)
        assert np.isfinite(hist[-1]["train_loss"])
