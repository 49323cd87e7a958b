"""Serving-path tests: the whole-step INFERENCE kernel wired into the
production eval path (trainer.evaluate / eval_step_for_batch / CLI verbs).

VERDICT round-2 item 2: the 6.9×-measured serving kernel must be reachable
outside bench.py. These tests pin (a) SELECTION — an eligible packed batch
with a fused plan routes through the kernel, everything else falls back —
(b) PARITY — fused eval metrics match the XLA eval path after real
training so the BN running stats are non-trivial — and (c) CACHING — the
jitted fused step is reused across evaluate() calls (a per-call rebuild
would recompile the kernel every epoch)."""

import dataclasses
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

SMILES = ["CCO", "c1ccccc1", "CC(=O)O", "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
          "CN1C=NC2=C1C(=O)N(C(=O)N2C)C", "C1CCCCC1", "NC(=O)c1ccccc1",
          "OC(=O)c1ccccc1O", "CCN", "CCCN", "CC(C)O", "c1ccccc1N"]


def _train_full_driver(epochs=2, fuse_step=False):
    """Train the REAL lipo-driver network shape (graph-norm wrapper +
    BatchNorm1d + halving head) for a couple of epochs so the running
    stats the eval kernel folds are non-trivial."""
    from mpnn_tpu import graphs as G
    from mpnn_tpu import models
    from mpnn_tpu.models.network import NetworkConfig
    from mpnn_tpu.train import trainer
    gs, ge = G.encode_molgraphs(G.generate_molgraphs(
        SMILES, [0.1 * len(s) for s in SMILES]))
    nf = ge.atom_width() + 3
    mcfg = models.MPNNConfig(
        node_features=nf, edge_features=ge.bond_width(),
        message_features=nf, output_dim=2 * ge.atom_width(),
        message_steps=3, msg_norm="bn1d", state_norm="bn1d",
        edge_mlp_tail_repeats=2)
    cfg = NetworkConfig(mpnn=mcfg, input_wrapper="graph_norm",
                        nafm_features=3, head="halving", head_output=1,
                        head_bn=True)
    tcfg = trainer.TrainConfig(
        epochs=epochs, batch_size=4, learning_rate=1e-2, loss="mse",
        packed=True, fuse_step=fuse_step,
        spmm="kernel_interpret" if fuse_step else "xla",
        seed=317, shuffle=False, log_path=None)
    params, state, _, _ = trainer.train(cfg, tcfg, gs)
    return gs, cfg, params, state


class TestEvalStepSelection:
    def test_fused_selected_and_cached(self):
        from mpnn_tpu import graphs as G
        from mpnn_tpu.train import trainer
        gs, cfg, params, state = _train_full_driver()
        loader = G.GraphLoader(gs, 8, collate="packed", with_nafm=True,
                               fused_step_plan=True)
        batch = next(iter(loader))
        assert "fs_win" in batch
        base = trainer.make_eval_step(cfg, "mse")
        fused = trainer.eval_step_for_batch(cfg, "mse", batch,
                                            fuse_eval=True, interpret=True)
        assert fused is not base, "eligible batch must select the kernel"
        # cache: the SAME jitted step object comes back (no per-epoch
        # recompile)
        again = trainer.eval_step_for_batch(cfg, "mse", batch,
                                            fuse_eval=True, interpret=True)
        assert again is fused
        # fuse_eval=False and plan-less batches fall back to the XLA step
        off = trainer.eval_step_for_batch(cfg, "mse", batch,
                                          fuse_eval=False, interpret=True)
        assert off is base
        plain = {k: v for k, v in batch.items() if not k.startswith("fs_")}
        nofs = trainer.eval_step_for_batch(cfg, "mse", plain,
                                           fuse_eval=True, interpret=True)
        assert nofs is base
        # below the launch-bound crossover (~batch 8) the XLA step wins
        # by ~5 µs — the shipped path must never pick the slower kernel
        small_loader = G.GraphLoader(gs, 4, collate="packed",
                                     with_nafm=True, fused_step_plan=True)
        small = next(iter(small_loader))
        assert "fs_win" in small
        tiny = trainer.eval_step_for_batch(cfg, "mse", small,
                                           fuse_eval=True, interpret=True)
        assert tiny is base

    def test_ineligible_config_falls_back(self):
        """A config outside the kernel's shape (per-step norms) must fall
        back silently even when the batch carries a plan."""
        from mpnn_tpu import graphs as G
        from mpnn_tpu.train import trainer
        gs, cfg, params, state = _train_full_driver()
        bad = dataclasses.replace(
            cfg, mpnn=dataclasses.replace(cfg.mpnn, per_step_norms=True))
        loader = G.GraphLoader(gs, 4, collate="packed", with_nafm=True,
                               fused_step_plan=True)
        batch = next(iter(loader))
        step = trainer.eval_step_for_batch(bad, "mse", batch,
                                           fuse_eval=True, interpret=True)
        assert step is trainer.make_eval_step(bad, "mse")


class TestEvaluateParity:
    def test_metrics_match_xla_eval(self):
        """trainer.evaluate through the serving kernel == the XLA eval
        path, on the full driver network after real training (non-trivial
        EMAs, wrapper + head BN + halving head around the fused core)."""
        from mpnn_tpu import graphs as G
        from mpnn_tpu.train import trainer
        gs, cfg, params, state = _train_full_driver()
        loader = G.GraphLoader(gs, 8, collate="packed", with_nafm=True,
                               fused_step_plan=True)
        m_fused = trainer.evaluate(params, state, cfg, loader, "mse",
                                   fuse_eval=True, interpret=True)
        m_xla = trainer.evaluate(params, state, cfg, loader, "mse",
                                 fuse_eval=False)
        assert m_fused["rmse"] == pytest.approx(m_xla["rmse"], rel=2e-4)
        assert m_fused["loss"] == pytest.approx(m_xla["loss"], rel=2e-4)

    def test_val_loader_carries_plan_when_fuse_step(self):
        """train(fuse_step=True) gives its val loader the fused plan so
        per-epoch evaluation rides the serving kernel too."""
        from mpnn_tpu import graphs as G
        from mpnn_tpu import models
        from mpnn_tpu.models.network import NetworkConfig
        from mpnn_tpu.train import trainer
        gs, ge = G.encode_molgraphs(G.generate_molgraphs(
            SMILES, [0.1 * len(s) for s in SMILES]))
        nf = ge.atom_width()
        mcfg = models.MPNNConfig(
            node_features=nf, edge_features=ge.bond_width(),
            message_features=nf, output_dim=1, message_steps=2,
            msg_norm="bn1d", state_norm="bn1d", edge_mlp_tail_repeats=2)
        cfg = NetworkConfig(mpnn=mcfg, input_wrapper="plain", head="none")
        tcfg = trainer.TrainConfig(
            epochs=2, batch_size=8, learning_rate=1e-2, loss="mse",
            packed=True, fuse_step=True, spmm="kernel_interpret",
            seed=317, shuffle=False, log_path=None)
        _, _, _, hist = trainer.train(cfg, tcfg, gs, gs)
        assert "val_rmse" in hist[-1]
        assert np.isfinite(hist[-1]["val_rmse"])


class TestServingCLI:
    def test_eval_and_predict_fuse_eval(self, tmp_path, capsys):
        """CLI eval/predict --fuse-eval run the serving kernel (interpret
        on CPU) and agree with the plain XLA verbs."""
        import pandas as pd
        from mpnn_tpu.train import cli
        csv = os.path.join(str(tmp_path), "d.csv")
        pd.DataFrame({"smiles": SMILES,
                      "exp": [0.1 * len(s) for s in SMILES]}).to_csv(
            csv, index=False)
        ckdir = os.path.join(str(tmp_path), "ck")
        cli.main(["train", "--experiment", "lipo", "--data", csv,
                  "--epochs", "2", "--batch-size", "4",
                  "--ckpt-dir", ckdir])
        capsys.readouterr()
        ck = os.path.join(ckdir, "ckpt_1.npz")
        assert os.path.exists(ck)

        cli.main(["eval", "--experiment", "lipo", "--data", csv,
                  "--ckpt", ck, "--fuse-eval", "--interpret"])
        fused = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        cli.main(["eval", "--experiment", "lipo", "--data", csv,
                  "--ckpt", ck, "--packed"])
        xla = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert fused["rmse"] == pytest.approx(xla["rmse"], rel=2e-4)

        cli.main(["predict", "--experiment", "lipo", "--data", csv,
                  "--ckpt", ck, "--fuse-eval", "--interpret"])
        preds_fused = [json.loads(l)["pred"] for l in
                       capsys.readouterr().out.strip().splitlines()]
        cli.main(["predict", "--experiment", "lipo", "--data", csv,
                  "--ckpt", ck, "--packed"])
        preds_xla = [json.loads(l)["pred"] for l in
                     capsys.readouterr().out.strip().splitlines()]
        assert len(preds_fused) == len(SMILES)
        np.testing.assert_allclose(preds_fused, preds_xla,
                                   rtol=2e-4, atol=1e-5)
