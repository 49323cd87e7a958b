"""CLI surface tests (in-process main(argv) on tiny data)."""

import json
import os

import pandas as pd
import pytest

from mpnn_tpu.train import cli

SMILES = ["CCO", "CCCO", "CCCCO", "CC(C)O", "CCC(C)O", "c1ccccc1O",
          "CC(=O)O", "CCC(=O)O", "CCN", "CCCN", "CC(C)N", "c1ccccc1N"]


@pytest.fixture()
def csv(tmp_path):
    p = os.path.join(str(tmp_path), "d.csv")
    pd.DataFrame({"smiles": SMILES,
                  "exp": [0.1 * len(s) for s in SMILES],
                  "target": [int("N" in s) for s in SMILES],
                  "pXC50": [5.0 + i for i in range(len(SMILES))]}).to_csv(
        p, index=False)
    return p


def test_list(capsys):
    cli.main(["list"])
    out = capsys.readouterr().out
    assert "lipo" in out and "zoo:" in out


@pytest.mark.slow
def test_featurize_then_train_from_cache(csv, tmp_path, capsys):
    cache = os.path.join(str(tmp_path), "cache.npz")
    cli.main(["featurize", "--experiment", "lipo", "--data", csv,
              "--out", cache])
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta["graphs"] == len(SMILES)

    ckdir = os.path.join(str(tmp_path), "ck")
    cli.main(["train", "--experiment", "lipo", "--data", csv,
              "--cache", cache, "--epochs", "2", "--batch-size", "4",
              "--ckpt-dir", ckdir])
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result["experiment"] == "lipo" and "rmse" in result["test"]

    # eval + predict on the saved checkpoint
    ck = os.path.join(ckdir, "ckpt_1.npz")
    assert os.path.exists(ck)
    cli.main(["eval", "--experiment", "lipo", "--data", csv,
              "--cache", cache, "--ckpt", ck])
    ev = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "rmse" in ev

    cli.main(["predict", "--experiment", "lipo", "--data", csv,
              "--cache", cache, "--ckpt", ck])
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == len(SMILES)
    assert all("pred" in r for r in lines)


@pytest.mark.slow
def test_lipo_ggnn_train_with_cache_roundtrip(csv, tmp_path, capsys):
    """The GGNN lipo experiment end-to-end: bond-type ids derived at
    featurize time, survive the .npz cache round-trip, and the packed
    trainer runs (fused-step eligible config)."""
    cache = os.path.join(str(tmp_path), "cache_ggnn.npz")
    cli.main(["featurize", "--experiment", "lipo_ggnn", "--data", csv,
              "--out", cache])
    capsys.readouterr()
    from mpnn_tpu import graphs as G
    gs, _, _ = G.load_cache(cache)
    assert all(hasattr(g, "edge_types") for g in gs)
    assert all(g.edge_types.shape == g.edge_src.shape for g in gs)

    cli.main(["train", "--experiment", "lipo_ggnn", "--data", csv,
              "--cache", cache, "--epochs", "2", "--batch-size", "4",
              "--packed"])
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result["experiment"] == "lipo_ggnn"
    assert result["epochs"] == 2
    import math
    assert math.isfinite(result["test"]["rmse"])


def test_filtered_to_empty_errors(csv):
    with pytest.raises(SystemExit, match="no graphs left"):
        cli.main(["train", "--experiment", "encoded_affinity",
                  "--data", csv, "--epochs", "1"])
