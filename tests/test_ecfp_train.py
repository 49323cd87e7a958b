"""ECFP multi-label training path end-to-end (test_graph_encode_norm_ecfp
equivalent at small nbits) + profiling utility smoke tests."""

import dataclasses
import os

import numpy as np
import jax
import pytest

from mpnn_tpu import graphs as G, models
from mpnn_tpu.train import trainer

SMILES = ["CCO", "CCCO", "CC(C)O", "c1ccccc1O", "CC(=O)O", "CCN",
          "c1ccccc1N", "CCOC", "c1ccncc1", "CCS", "CCCl", "C1CCCCC1"]


def test_ecfp_multilabel_training(tmp_path):
    import pandas as pd
    nbits = 256
    path = os.path.join(str(tmp_path), "d.csv")
    pd.DataFrame({"smiles": SMILES,
                  "target": list(range(len(SMILES)))}).to_csv(path,
                                                              index=False)
    gs, ge = G.load_ecfp_dataset(path, "smiles", "target", nbits=nbits)
    assert gs[0].label.shape[-1] == nbits

    # encoded_ecfp-style model shrunk for raw widths (no frozen AEs needed
    # for the loss-path test)
    nf = ge.atom_width()
    cfg = models.NetworkConfig(
        mpnn=models.MPNNConfig(
            node_features=nf, edge_features=ge.bond_width(),
            message_features=nf, output_dim=16, message_steps=2,
            share_message_weights=False, per_step_norms=True,
            msg_norm="bn1d", output_norm=True, edge_mlp_tail_repeats=2),
        head="linear", head_output=nbits, kaiming_head=True)
    tcfg = trainer.TrainConfig(epochs=5, batch_size=4, learning_rate=1e-3,
                               loss="ecfp_mse")
    params, state, _, hist = trainer.train(cfg, tcfg, gs, with_nafm=False)
    assert hist[-1]["train_loss"] < hist[0]["train_loss"]
    assert np.isfinite(hist[-1]["train_loss"])


def test_profiling_utilities():
    from mpnn_tpu.utils.profiling import StepTimer, ThroughputMeter
    t = StepTimer(warmup=1)
    for _ in range(4):
        t.record(0.01)
    s = t.summary()
    assert s["steps"] == 3 and s["mean_s"] == pytest.approx(0.01)
    m = ThroughputMeter()
    m.add(edges=100, graphs=4)
    m.add(edges=100, graphs=4)
    r = m.rates()
    assert r["edges_per_s"] > 0 and r["steps_per_s"] > 0
