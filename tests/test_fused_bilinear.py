"""Parity tests for the fused BILINEAR kernel (kernels/fused_bilinear.py)
vs sparse_mpnn_apply — the basic_model_ecfp family shape (parameterless
bilinear messages from the EVOLVING state, GRU hidden = initial,
concat-state-history readout). Interpret mode on CPU."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

SMILES = ["CCO", "c1ccccc1", "CC(=O)O", "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
          "CN1C=NC2=C1C(=O)N(C(=O)N2C)C", "C1CCCCC1", "NC(=O)c1ccccc1",
          "OC(=O)c1ccccc1O", "CCN", "CC(C)O"] * 3


def _setup(steps=2):
    from mpnn_tpu import graphs as G
    from mpnn_tpu import models
    from mpnn_tpu.kernels.fused_step import attach_fused_plan
    gs = G.generate_molgraphs(SMILES, list(range(len(SMILES))))
    gs, ge = G.encode_molgraphs(gs)
    cfg = models.MPNNConfig(
        node_features=2, edge_features=8, message_features=2,
        output_dim=32, message_fn="bilinear", aggregation="adj",
        message_steps=steps, message_input="state",
        update_hidden="initial", concat_state_history=True)
    params, state = models.mpnn_init(jax.random.PRNGKey(317), cfg)
    packed = G.collate_packed(gs).as_dict()
    nf3 = cfg.node_features ** 3
    ef = np.asarray(packed["edge_feats"])
    if ef.shape[-1] < nf3:
        ef = np.pad(ef, ((0, 0), (0, nf3 - ef.shape[-1])))
    packed["edge_feats"] = ef[:, :nf3]
    packed["node_feats"] = np.concatenate(
        [packed["node_feats"], packed["node_nafm"]],
        axis=-1)[:, :cfg.node_features]
    packed = G.attach_edge_vocab(packed, vocab_cap=16)
    packed = attach_fused_plan(packed, block_edges=128)
    assert "fs_win" in packed and "edge_vid" in packed
    jb = {k: jnp.asarray(v) if not np.isscalar(v) else v
          for k, v in packed.items()}
    return cfg, params, state, jb


def _tree_close(a, b, rtol, atol, what):
    fa, ta = jax.tree.flatten(a)
    fb, tb = jax.tree.flatten(b)
    assert ta == tb
    for i, (xa, xb) in enumerate(zip(fa, fb)):
        np.testing.assert_allclose(
            np.asarray(xa), np.asarray(xb), rtol=rtol, atol=atol,
            err_msg=f"{what} leaf {i}")


class TestFusedBilinear:
    @pytest.mark.parametrize("steps", [1, 2, 3])
    def test_out_and_grads_match_sparse(self, steps):
        from mpnn_tpu.models.fused_train import (fused_bilinear_out,
                                                 fused_step_eligible,
                                                 make_fused_step_for_batch)
        from mpnn_tpu.models.sparse import sparse_mpnn_apply
        cfg, params, state, jb = _setup(steps=steps)
        assert fused_step_eligible(cfg, jb, training=True)
        op = make_fused_step_for_batch(cfg, jb, interpret=True)
        gm = jb["graph_mask"][:, None]
        labels = jnp.asarray(np.random.RandomState(3).randn(
            gm.shape[0]).astype(np.float32))

        def loss_fused(p):
            out, _ = fused_bilinear_out(p, state, cfg, jb, op)
            per = ((out - labels[:, None]) ** 2) * gm
            return per.sum() / gm.sum(), out

        def loss_ref(p):
            out, _ = sparse_mpnn_apply(p, state, cfg, jb, training=True)
            per = ((out - labels[:, None]) ** 2) * gm
            return per.sum() / gm.sum(), out

        (lf, of), gf = jax.value_and_grad(loss_fused, has_aux=True)(params)
        (lr, orf), gr = jax.value_and_grad(loss_ref, has_aux=True)(params)
        np.testing.assert_allclose(np.asarray(of), np.asarray(orf),
                                   rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(lf, lr, rtol=2e-5)
        _tree_close(gf, gr, 2e-3, 2e-5, f"bilinear grad[T={steps}]")

    def test_eval_matches_sparse_eval(self):
        from mpnn_tpu.models.fused_train import (fused_eval_eligible,
                                                 fused_mpnn_eval,
                                                 make_fused_eval_for_batch)
        from mpnn_tpu.models.sparse import sparse_mpnn_apply
        cfg, params, state, jb = _setup()
        assert fused_eval_eligible(cfg, jb)
        eval_op = make_fused_eval_for_batch(cfg, jb, interpret=True)
        out_k = fused_mpnn_eval(params, state, cfg, jb, eval_op)
        out_r, _ = sparse_mpnn_apply(params, state, cfg, jb,
                                     training=False)
        np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                                   rtol=2e-4, atol=1e-5)

    def test_h0_gradient_through_kernel(self):
        """dL/dh0 flows through BOTH the per-step src/dst gathers of the
        evolving state and the GRU hidden path — compare against the
        sparse path's h0 gradient directly."""
        from mpnn_tpu.models.fused_train import (fused_bilinear_out,
                                                 make_fused_step_for_batch)
        from mpnn_tpu.models.sparse import sparse_mpnn_apply
        cfg, params, state, jb = _setup()
        op = make_fused_step_for_batch(cfg, jb, interpret=True)

        def lf(nf_):
            b = dict(jb)
            b["node_feats"] = nf_
            out, _ = fused_bilinear_out(params, state, cfg, b, op)
            return (out ** 2).sum()

        def lr(nf_):
            b = dict(jb)
            b["node_feats"] = nf_
            out, _ = sparse_mpnn_apply(params, state, cfg, b,
                                       training=True)
            return (out ** 2).sum()

        gk = jax.grad(lf)(jb["node_feats"])
        gs = jax.grad(lr)(jb["node_feats"])
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gs),
                                   rtol=2e-3, atol=2e-5)
