"""Training-stack tests: metrics vs sklearn, Adam vs torch, plateau
scheduler vs torch, checkpoint round-trip/resume, tiny end-to-end runs."""

import json
import os

import numpy as np
import pytest

from mpnn_tpu.train import metrics as M
from mpnn_tpu.train.optim import ReduceLROnPlateau


class TestMetricsVsSklearn:
    y_true = [0, 1, 2, 2, 1, 0, 1, 2, 2, 0]
    y_pred = [0, 2, 2, 2, 1, 1, 1, 0, 2, 0]

    @pytest.mark.parametrize("avg", ["weighted", "micro", "macro"])
    def test_prf(self, avg):
        import sklearn.metrics as SK
        p, r, f = M.precision_recall_f1(self.y_true, self.y_pred, avg)
        assert p == pytest.approx(SK.precision_score(
            self.y_true, self.y_pred, average=avg, zero_division=0))
        assert r == pytest.approx(SK.recall_score(
            self.y_true, self.y_pred, average=avg, zero_division=0))
        assert f == pytest.approx(SK.f1_score(
            self.y_true, self.y_pred, average=avg, zero_division=0))

    def test_binary(self):
        import sklearn.metrics as SK
        yt = [0, 1, 1, 0, 1]
        yp = [1, 1, 0, 0, 1]
        p, r, f = M.precision_recall_f1(yt, yp, "binary")
        assert p == pytest.approx(SK.precision_score(yt, yp))
        assert r == pytest.approx(SK.recall_score(yt, yp))

    def test_accuracy_mse(self):
        import sklearn.metrics as SK
        assert M.accuracy(self.y_true, self.y_pred) == pytest.approx(
            SK.accuracy_score(self.y_true, self.y_pred))
        a = np.linspace(0, 1, 7)
        b = a + 0.3
        assert M.mean_squared_error(a, b) == pytest.approx(
            SK.mean_squared_error(a, b))


class TestAdamVsTorch:
    def test_trajectory_matches_torch(self):
        """Coupled weight decay + Adam must track torch.optim.Adam."""
        import jax
        import jax.numpy as jnp
        import torch
        from mpnn_tpu.train.optim import adam

        w0 = np.linspace(-1, 1, 6).astype(np.float32).reshape(2, 3)
        lr, wd = 1e-2, 1e-2

        tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
        topt = torch.optim.Adam([tw], lr=lr, weight_decay=wd)

        tx = adam(lr, weight_decay=wd)
        jw = jnp.asarray(w0)
        opt_state = tx.init(jw)

        for step in range(10):
            g = (0.1 * (step + 1) * np.ones_like(w0)).astype(np.float32)
            topt.zero_grad()
            tw.grad = torch.from_numpy(g.copy())
            topt.step()
            updates, opt_state = tx.update(jnp.asarray(g), opt_state, jw)
            jw = jw + updates
        np.testing.assert_allclose(np.asarray(jw), tw.detach().numpy(),
                                   atol=1e-5)


class TestPlateauVsTorch:
    def test_matches_torch_scheduler(self):
        import torch
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=1.0)
        tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(opt)
        ours = ReduceLROnPlateau(1.0)
        rs = np.random.RandomState(0)
        metric = 10.0
        for step in range(60):
            # plateau after step 20
            metric = metric * 0.9 if step < 20 else metric
            tsched.step(metric)
            lr_ours = ours.step(metric)
            assert lr_ours == pytest.approx(opt.param_groups[0]["lr"]), step


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        import jax
        from mpnn_tpu.train.checkpoint import (load_checkpoint,
                                               save_checkpoint)
        params = {"a": np.arange(6.0).reshape(2, 3),
                  "b": [{"w": np.ones((2,))}, {"w": np.zeros((3,))}]}
        state = {"bn": {"running_mean": np.full((4,), 7.0)}}
        p = os.path.join(str(tmp_path), "ck.npz")
        save_checkpoint(p, params=params, state=state, meta={"epoch": 3})
        tpl_p = jax.tree.map(np.zeros_like, params)
        tpl_s = jax.tree.map(np.zeros_like, state)
        rp, rs, _, meta = load_checkpoint(p, params=tpl_p, state=tpl_s)
        np.testing.assert_array_equal(rp["a"], params["a"])
        np.testing.assert_array_equal(rs["bn"]["running_mean"],
                                      state["bn"]["running_mean"])
        assert meta["epoch"] == 3

    def test_shape_mismatch_rejected(self, tmp_path):
        import jax
        from mpnn_tpu.train.checkpoint import (load_checkpoint,
                                               save_checkpoint)
        p = os.path.join(str(tmp_path), "ck.npz")
        save_checkpoint(p, params={"a": np.zeros((2,))})
        with pytest.raises(ValueError, match="shape mismatch"):
            load_checkpoint(p, params={"a": np.zeros((3,))})


class TestEndToEnd:
    SMILES = ["CCO", "CCCO", "CCCCO", "CC(C)O", "CCC(C)O", "c1ccccc1O",
              "CC(=O)O", "CCC(=O)O", "CCN", "CCCN", "CC(C)N", "c1ccccc1N"]

    def _csv(self, tmp_path, label_kind):
        import pandas as pd
        if label_kind == "float":
            labels = [0.1 * len(s) for s in self.SMILES]
        else:
            labels = [int("N" in s) for s in self.SMILES]
        path = os.path.join(str(tmp_path), "d.csv")
        pd.DataFrame({"smiles": self.SMILES, "exp": labels,
                      "target": labels}).to_csv(path, index=False)
        return path

    def test_lipo_experiment_loss_decreases(self, tmp_path):
        import dataclasses
        from mpnn_tpu import graphs as G
        from mpnn_tpu.models import build
        from mpnn_tpu.train import trainer
        path = self._csv(tmp_path, "float")
        gs, ge = G.load_number_dataset(path, "smiles", "exp")
        cfg = build("lipo", afm=ge.atom_width(), bfm=ge.bond_width(),
                    nafm=3, n_out=1)
        m = dataclasses.replace(cfg.mpnn, edge_mlp_tail_repeats=2,
                                message_steps=2)
        cfg = dataclasses.replace(cfg, mpnn=m)
        tcfg = trainer.TrainConfig(epochs=8, batch_size=4,
                                   learning_rate=1e-2, weight_decay=1e-4,
                                   loss="mse", plateau=True,
                                   log_path=os.path.join(str(tmp_path),
                                                         "log.jsonl"))
        params, state, opt, hist = trainer.train(cfg, tcfg, gs, gs)
        assert hist[-1]["train_loss"] < hist[0]["train_loss"]
        # JSONL log written
        with open(tcfg.log_path) as f:
            lines = [json.loads(l) for l in f]
        assert len(lines) == 8 and "val_rmse" in lines[-1]

    def test_classification_resume(self, tmp_path):
        import dataclasses
        from mpnn_tpu import graphs as G
        from mpnn_tpu.models import build
        from mpnn_tpu.train import trainer
        path = self._csv(tmp_path, "int")
        gs, n_classes, _, ge = G.load_classification_dataset(
            path, "smiles", "target")
        cfg = build("basic", afm=ge.atom_width(), bfm=ge.bond_width(),
                    n_out=n_classes)
        m = dataclasses.replace(cfg.mpnn, edge_mlp_tail_repeats=2,
                                message_steps=2)
        cfg = dataclasses.replace(cfg, mpnn=m)
        ckdir = os.path.join(str(tmp_path), "ck")
        tcfg = trainer.TrainConfig(epochs=3, batch_size=4, loss="ce",
                                   ckpt_dir=ckdir)
        trainer.train(cfg, tcfg, gs, gs)
        assert os.path.exists(os.path.join(ckdir, "ckpt_2.npz"))
        # resume continues from epoch 3
        tcfg2 = dataclasses.replace(tcfg, epochs=5)
        _, _, _, hist = trainer.train(cfg, tcfg2, gs, gs, resume=True)
        assert [h["epoch"] for h in hist] == [3, 4]

    def test_eval_metrics_present(self, tmp_path):
        import dataclasses
        from mpnn_tpu import graphs as G
        from mpnn_tpu.models import build
        from mpnn_tpu.train import trainer
        path = self._csv(tmp_path, "int")
        gs, n_classes, _, ge = G.load_classification_dataset(
            path, "smiles", "target")
        cfg = build("basic", afm=ge.atom_width(), bfm=ge.bond_width(),
                    n_out=n_classes)
        m = dataclasses.replace(cfg.mpnn, edge_mlp_tail_repeats=1,
                                message_steps=1)
        cfg = dataclasses.replace(cfg, mpnn=m)
        import jax
        from mpnn_tpu.models.network import network_init
        params, state = network_init(jax.random.PRNGKey(0), cfg)
        loader = G.GraphLoader(gs, 4, with_nafm=False)
        out = trainer.evaluate(params, state, cfg, loader, "ce", "weighted")
        for k in ("loss", "accuracy", "precision", "recall", "f1"):
            assert k in out


class TestPackedTraining:
    """Note: full multi-epoch TRAJECTORIES are not comparable across layouts
    — Adam's first-step update is ±lr·sign(g), so parameters whose true
    gradient is ~0 (e.g. message_bias under the message BN) amplify
    float-noise sign differences chaotically. The deterministic property is
    per-batch loss equality at shared state, asserted here; end-to-end
    packed training is separately checked to converge."""

    def _setup(self, tmp_path):
        import dataclasses
        import pandas as pd
        from mpnn_tpu import graphs as G
        from mpnn_tpu.models import build
        smiles = TestEndToEnd.SMILES
        path = os.path.join(str(tmp_path), "d.csv")
        pd.DataFrame({"smiles": smiles,
                      "exp": [0.1 * len(s) for s in smiles]}).to_csv(
            path, index=False)
        gs, ge = G.load_number_dataset(path, "smiles", "exp")
        cfg = build("lipo", afm=ge.atom_width(), bfm=ge.bond_width(),
                    nafm=3, n_out=1)
        m = dataclasses.replace(cfg.mpnn, edge_mlp_tail_repeats=2,
                                message_steps=2)
        return gs, dataclasses.replace(cfg, mpnn=m)

    @pytest.mark.slow
    def test_per_batch_loss_parity(self, tmp_path):
        import jax
        import jax.numpy as jnp
        from mpnn_tpu import graphs as G
        from mpnn_tpu.models.network import network_init
        from mpnn_tpu.train.trainer import make_loss_fn
        gs, cfg = self._setup(tmp_path)
        params, state = network_init(jax.random.PRNGKey(317), cfg)
        loss_fn = make_loss_fn(cfg, "mse")
        ld = G.GraphLoader(gs, 4, shuffle=False, collate="dense",
                           with_nafm=True)
        lp = G.GraphLoader(gs, 4, shuffle=False, collate="packed",
                           with_nafm=True)
        n = 0
        for bd, bp in zip(ld, lp):
            jd = {k: jnp.asarray(v) for k, v in bd.items()}
            jp = {k: jnp.asarray(v) for k, v in bp.items()}
            l1, _ = loss_fn(params, state, jd, True)
            l2, _ = loss_fn(params, state, jp, True)
            assert float(l1) == pytest.approx(float(l2), rel=1e-4)
            n += 1
        assert n == 3

    def test_packed_training_converges(self, tmp_path):
        import dataclasses
        from mpnn_tpu.train import trainer
        gs, cfg = self._setup(tmp_path)
        tcfg = trainer.TrainConfig(epochs=6, batch_size=4,
                                   learning_rate=1e-2, loss="mse",
                                   packed=True)
        _, _, _, hist = trainer.train(cfg, tcfg, gs, gs)
        assert hist[-1]["train_loss"] < hist[0]["train_loss"]
        assert "val_mse" in hist[-1]


class TestMixedPrecision:
    def test_bf16_training_converges(self, tmp_path):
        import dataclasses
        import pandas as pd
        from mpnn_tpu import graphs as G
        from mpnn_tpu.models import build
        from mpnn_tpu.train import trainer
        smiles = TestEndToEnd.SMILES
        path = os.path.join(str(tmp_path), "d.csv")
        pd.DataFrame({"smiles": smiles,
                      "exp": [0.1 * len(s) for s in smiles]}).to_csv(
            path, index=False)
        gs, ge = G.load_number_dataset(path, "smiles", "exp")
        cfg = build("lipo", afm=ge.atom_width(), bfm=ge.bond_width(),
                    nafm=3, n_out=1)
        m = dataclasses.replace(cfg.mpnn, edge_mlp_tail_repeats=2,
                                message_steps=2)
        cfg = dataclasses.replace(cfg, mpnn=m)
        tcfg = trainer.TrainConfig(epochs=6, batch_size=4,
                                   learning_rate=1e-2, loss="mse",
                                   compute_dtype="bfloat16", packed=True)
        params, _, _, hist = trainer.train(cfg, tcfg, gs, gs)
        assert hist[-1]["train_loss"] < hist[0]["train_loss"]
        # master params stay f32
        import jax
        assert all(l.dtype == np.float32 for l in jax.tree.leaves(params))


@pytest.mark.slow
class TestPreemption:
    def test_sigterm_checkpoints_and_resumes(self, tmp_path):
        """Real contract: a training PROCESS that receives SIGTERM saves a
        checkpoint and exits cleanly; --resume continues."""
        import subprocess
        import sys
        import time
        import pandas as pd
        smiles = TestEndToEnd.SMILES
        path = os.path.join(str(tmp_path), "d.csv")
        pd.DataFrame({"smiles": smiles,
                      "exp": [0.1 * len(s) for s in smiles]}).to_csv(
            path, index=False)
        ckdir = os.path.join(str(tmp_path), "ck")
        script = f"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import dataclasses
from mpnn_tpu import graphs as G
from mpnn_tpu.models import build
from mpnn_tpu.train import trainer
gs, ge = G.load_number_dataset({path!r}, "smiles", "exp")
cfg = build("lipo", afm=ge.atom_width(), bfm=ge.bond_width(), nafm=3,
            n_out=1)
m = dataclasses.replace(cfg.mpnn, edge_mlp_tail_repeats=1, message_steps=1)
cfg = dataclasses.replace(cfg, mpnn=m)
tcfg = trainer.TrainConfig(epochs=10 ** 6, batch_size=4, loss="mse",
                           ckpt_dir={ckdir!r}, ckpt_every=10 ** 9)
print("TRAIN_STARTING", flush=True)
trainer.train(cfg, tcfg, gs, gs)
print("TRAIN_EXITED", flush=True)
"""
        proc = subprocess.Popen([sys.executable, "-c", script],
                                stdout=subprocess.PIPE,
                                stderr=subprocess.PIPE, text=True,
                                cwd=os.path.dirname(os.path.dirname(
                                    os.path.abspath(__file__))))
        # wait until at least two epochs have been logged (the MetricLogger
        # echoes JSONL records to stderr), then preempt
        seen = 0
        while seen < 2:
            line = proc.stderr.readline()
            if not line:
                break
            if '"epoch"' in line:
                seen += 1
        assert seen >= 2, "training never reached epoch 2"
        proc.send_signal(15)    # SIGTERM
        out, _ = proc.communicate(timeout=120)
        assert proc.returncode == 0, out
        assert "TRAIN_EXITED" in out
        from mpnn_tpu.train.checkpoint import latest_checkpoint
        assert latest_checkpoint(ckdir) is not None


@pytest.mark.slow
class TestPreemptionMidEpoch:
    def test_mid_epoch_sigterm_saves_last_complete_epoch(
            self, tmp_path, monkeypatch):
        """A SIGTERM landing MID-epoch must persist the end-of-previous-
        epoch state — not mislabel the half-trained params as that epoch
        (which would make --resume double-train the early batches)."""
        import dataclasses
        import signal
        import jax
        from mpnn_tpu import graphs as G
        from mpnn_tpu.models import build
        from mpnn_tpu.train import trainer
        from mpnn_tpu.train.checkpoint import (latest_checkpoint,
                                               load_checkpoint)

        smiles = TestEndToEnd.SMILES            # 12 graphs, bs 4 → 3 batches
        gs, ge = G.encode_molgraphs(G.generate_molgraphs(
            smiles, [0.1 * len(s) for s in smiles]))
        cfg = build("lipo", afm=ge.atom_width(), bfm=ge.bond_width(),
                    nafm=3, n_out=1)
        m = dataclasses.replace(cfg.mpnn, edge_mlp_tail_repeats=1,
                                message_steps=1)
        cfg = dataclasses.replace(cfg, mpnn=m)

        # reference: one full epoch, checkpointed normally
        dir_a = os.path.join(str(tmp_path), "a")
        trainer.train(cfg, trainer.TrainConfig(
            epochs=1, batch_size=4, loss="mse", ckpt_dir=dir_a,
            shuffle=False), gs)
        from mpnn_tpu.models import network_init
        template, _ = network_init(jax.random.PRNGKey(317), cfg)
        want_params, _, _, _ = load_checkpoint(
            os.path.join(dir_a, "ckpt_0.npz"), params=template)

        # interrupted run: SIGTERM arrives after 1 of 3 batches of epoch 1
        class InterruptingLoader(trainer.GraphLoader):
            yielded = 0

            def __iter__(self):
                for batch in super().__iter__():
                    if InterruptingLoader.yielded == 4:
                        signal.raise_signal(signal.SIGTERM)
                    InterruptingLoader.yielded += 1
                    yield batch

        monkeypatch.setattr(trainer, "GraphLoader", InterruptingLoader)
        dir_b = os.path.join(str(tmp_path), "b")
        trainer.train(cfg, trainer.TrainConfig(
            epochs=5, batch_size=4, loss="mse", ckpt_dir=dir_b,
            shuffle=False), gs)
        ck = latest_checkpoint(dir_b)
        assert ck is not None and ck.endswith("ckpt_0.npz"), ck
        got_params, _, _, meta = load_checkpoint(ck, params=template)
        assert int(meta["epoch"]) == 0
        # bit-equal to the uninterrupted epoch-0 state (identical batch
        # order and compute path in both runs)
        for a, b in zip(jax.tree.leaves(want_params),
                        jax.tree.leaves(got_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestInjectedLR:
    def test_set_learning_rate_scales_updates(self):
        import jax.numpy as jnp
        from mpnn_tpu.train.optim import adam, set_learning_rate
        tx = adam(1e-2)
        w = jnp.ones((4,))
        st = tx.init(w)
        g = jnp.ones((4,))
        u1, st = tx.update(g, st, w)
        st = set_learning_rate(st, 1e-4)
        u2, st = tx.update(g, st, w)
        assert float(jnp.abs(u2).mean()) < float(jnp.abs(u1).mean()) / 50


@pytest.mark.slow
class TestKernelTrainer:
    def test_packed_training_with_pallas_kernel_interpret(self, tmp_path):
        """TrainConfig(spmm='kernel_interpret') routes the packed message
        step through the Pallas SpMM kernel (interpret mode on CPU) and
        must train equivalently to the XLA path."""
        import dataclasses
        from mpnn_tpu import graphs as G
        from mpnn_tpu.models import build
        from mpnn_tpu.train import trainer
        smiles = TestEndToEnd.SMILES
        gs, ge = G.encode_molgraphs(G.generate_molgraphs(
            smiles, [0.1 * len(s) for s in smiles]))
        cfg = build("lipo", afm=ge.atom_width(), bfm=ge.bond_width(),
                    nafm=3, n_out=1)
        cfg = dataclasses.replace(cfg, mpnn=dataclasses.replace(
            cfg.mpnn, edge_mlp_tail_repeats=2, message_steps=2))
        losses = {}
        for spmm in ("xla", "kernel_interpret"):
            tcfg = trainer.TrainConfig(
                epochs=3, batch_size=4, learning_rate=1e-2, loss="mse",
                packed=True, spmm=spmm, seed=317, shuffle=False,
                log_path=None)
            _, _, _, h = trainer.train(cfg, tcfg, gs)
            losses[spmm] = [r["train_loss"] for r in h]
        np.testing.assert_allclose(losses["kernel_interpret"],
                                   losses["xla"], rtol=5e-3)

    def test_packed_training_with_fused_recurrence_interpret(self):
        """TrainConfig(fuse_recurrence=True) routes the flagship step chain
        through the fused Pallas recurrence (interpret) — must match XLA."""
        import dataclasses
        from mpnn_tpu import graphs as G
        from mpnn_tpu.models import build
        from mpnn_tpu.train import trainer
        smiles = TestEndToEnd.SMILES
        gs, ge = G.encode_molgraphs(G.generate_molgraphs(
            smiles, [0.1 * len(s) for s in smiles]))
        cfg = build("lipo", afm=ge.atom_width(), bfm=ge.bond_width(),
                    nafm=3, n_out=1)
        cfg = dataclasses.replace(cfg, mpnn=dataclasses.replace(
            cfg.mpnn, edge_mlp_tail_repeats=2, message_steps=3))
        losses = {}
        for fuse in (False, True):
            tcfg = trainer.TrainConfig(
                epochs=3, batch_size=4, learning_rate=1e-2, loss="mse",
                packed=True, spmm="kernel_interpret", fuse_recurrence=fuse,
                seed=317, shuffle=False, log_path=None)
            _, _, _, h = trainer.train(cfg, tcfg, gs)
            losses[fuse] = [r["train_loss"] for r in h]
        # first epoch tight; later epochs drift through float chaos — the
        # per-step parity is 2e-5 (tests/test_sparse.py) but multi-epoch
        # trajectories across reassociated compute paths diverge (measured
        # up to ~10% by epoch 3), so only coarse agreement is asserted
        np.testing.assert_allclose(losses[True][0], losses[False][0],
                                   rtol=5e-3)
        np.testing.assert_allclose(losses[True], losses[False], rtol=0.25)

    def test_packed_training_with_fused_step_interpret(self):
        """TrainConfig(fuse_step=True) routes bare-MPNN mse training
        through the whole-step fused kernel (interpret) — must match the
        XLA path. The network must be the bare MPNN (plain wrapper, no
        head): that is the shape the kernel computes end-to-end."""
        import dataclasses
        from mpnn_tpu import graphs as G
        from mpnn_tpu import models
        from mpnn_tpu.graphs.dataloader import GraphLoader
        from mpnn_tpu.models.network import NetworkConfig
        from mpnn_tpu.train import trainer
        smiles = TestEndToEnd.SMILES
        gs, ge = G.encode_molgraphs(G.generate_molgraphs(
            smiles, [0.1 * len(s) for s in smiles]))
        nf = ge.atom_width()
        mcfg = models.MPNNConfig(
            node_features=nf, edge_features=ge.bond_width(),
            message_features=nf, output_dim=1, message_steps=3,
            msg_norm="bn1d", state_norm="bn1d", edge_mlp_tail_repeats=2)
        cfg = NetworkConfig(mpnn=mcfg, input_wrapper="plain", head="none")
        # the loader must attach the fused window plan for these molecules
        probe = next(iter(GraphLoader(gs, 4, collate="packed",
                                      fused_step_plan=True)))
        assert "fs_win" in probe
        losses = {}
        for fuse in (False, True):
            tcfg = trainer.TrainConfig(
                epochs=2, batch_size=4, learning_rate=1e-2, loss="mse",
                packed=True, spmm="kernel_interpret", fuse_step=fuse,
                seed=317, shuffle=False, log_path=None)
            _, _, _, h = trainer.train(cfg, tcfg, gs)
            losses[fuse] = [r["train_loss"] for r in h]
        # tight per-step loss/grad parity is proven at the op level
        # (tests/test_fused_step.py::TestFusedFlagshipLoss); across a whole
        # epoch Adam's ±lr·sign amplification of float-noise gradients
        # (message_bias under the message BN is mathematically zero — see
        # CLAUDE.md) makes trajectories drift, so the trainer-wiring test
        # asserts coarse agreement only
        np.testing.assert_allclose(losses[True][0], losses[False][0],
                                   rtol=0.05)
        np.testing.assert_allclose(losses[True], losses[False], rtol=0.30)

    def test_fused_step_partial_last_batch(self):
        """REGRESSION: the fused train-step cache must key on node AND
        graph counts — a dataset size not divisible by batch_size gives
        the final batch fewer graphs, and the full-batch op (labels
        reshape, per-graph one-hots baked at build) crashed on it before
        the key included those counts."""
        import dataclasses
        from mpnn_tpu import graphs as G
        from mpnn_tpu import models
        from mpnn_tpu.models.network import NetworkConfig
        from mpnn_tpu.train import trainer
        smiles = TestEndToEnd.SMILES[:10]          # 10 graphs / bs 4 → 2
        gs, ge = G.encode_molgraphs(G.generate_molgraphs(
            smiles, [0.1 * len(s) for s in smiles]))
        nf = ge.atom_width()
        mcfg = models.MPNNConfig(
            node_features=nf, edge_features=ge.bond_width(),
            message_features=nf, output_dim=1, message_steps=2,
            msg_norm="bn1d", state_norm="bn1d", edge_mlp_tail_repeats=2)
        cfg = NetworkConfig(mpnn=mcfg, input_wrapper="plain", head="none")
        tcfg = trainer.TrainConfig(
            epochs=1, batch_size=4, learning_rate=1e-2, loss="mse",
            packed=True, spmm="kernel_interpret", fuse_step=True,
            seed=317, shuffle=False, log_path=None)
        _, _, _, h = trainer.train(cfg, tcfg, gs)
        assert np.isfinite(h[-1]["train_loss"])

    def test_fused_step_full_driver_network_interpret(self):
        """fuse_step=True on the REAL lipo-driver network shape (graph-norm
        wrapper + BatchNorm1d + halving head): the MPNN core runs fused
        (fused_mpnn_out) with head+loss in XLA. Tight per-step parity is
        op-level (tests/test_fused_step.py::TestFusedMpnnOutInNetwork);
        this asserts the trainer wiring engages and coarsely tracks."""
        import dataclasses
        from mpnn_tpu import graphs as G
        from mpnn_tpu import models
        from mpnn_tpu.graphs.dataloader import GraphLoader
        from mpnn_tpu.models.network import NetworkConfig
        from mpnn_tpu.train import trainer
        smiles = TestEndToEnd.SMILES
        gs, ge = G.encode_molgraphs(G.generate_molgraphs(
            smiles, [0.1 * len(s) for s in smiles]))
        nf = ge.atom_width() + 3
        mcfg = models.MPNNConfig(
            node_features=nf, edge_features=ge.bond_width(),
            message_features=nf, output_dim=2 * ge.atom_width(),
            message_steps=3, msg_norm="bn1d", state_norm="bn1d",
            edge_mlp_tail_repeats=2)
        cfg = NetworkConfig(mpnn=mcfg, input_wrapper="graph_norm",
                            nafm_features=3, head="halving",
                            head_output=1, head_bn=True)
        probe = next(iter(GraphLoader(gs, 4, collate="packed",
                                      fused_step_plan=True)))
        assert "fs_win" in probe
        losses = {}
        for fuse in (False, True):
            tcfg = trainer.TrainConfig(
                epochs=2, batch_size=4, learning_rate=1e-2, loss="mse",
                packed=True, spmm="kernel_interpret", fuse_step=fuse,
                seed=317, shuffle=False, log_path=None)
            _, _, _, h = trainer.train(cfg, tcfg, gs)
            losses[fuse] = [r["train_loss"] for r in h]
        # first epoch only: multi-epoch trajectories across reassociated
        # compute paths diverge through Adam's sign amplification of
        # float-noise gradients (CLAUDE.md numerical-comparison traps) —
        # tight per-step parity is the op-level test's job
        np.testing.assert_allclose(losses[True][0], losses[False][0],
                                   rtol=0.05)
        assert losses[True][-1] < losses[True][0]
        assert losses[False][-1] < losses[False][0]
