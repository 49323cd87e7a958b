"""Conformer-ensemble 3D model tests: end-to-end SMILES → conformers →
ensemble batch → forward/grad; conformer-mask correctness."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpnn_tpu import chem, graphs as G, models
from mpnn_tpu.graphs.graph import from_mol_3d
from mpnn_tpu.models.ensemble import (
    EnsembleConfig, collate_ensemble, ensemble_apply, ensemble_init,
    expand_distances,
)

SMILES = ["CCO", "CCCC", "CC(C)O", "c1ccccc1"]


@pytest.fixture(scope="module")
def ensemble_batch():
    sets = []
    for i, s in enumerate(SMILES):
        mol = chem.parse_smiles(s)
        confs = from_mol_3d(mol, label=float(i), n_conf=4, seed=i)
        sets.append(confs)
    # encode topological features across all base graphs
    bases = [cs[0] for cs in sets]
    ge = G.fit_encoders(bases)
    for cs in sets:
        enc = None
        for g in cs:
            g.encode(ge)
    return sets, ge


def make_cfg(ge, n_rbf=4):
    nf = ge.atom_width()
    ef = ge.bond_width() + n_rbf
    return EnsembleConfig(
        mpnn=models.MPNNConfig(
            node_features=nf, edge_features=ef, message_features=nf,
            output_dim=6, message_steps=2, edge_mlp_tail_repeats=2,
            state_norm="stateless"),
        max_conformers=4, n_rbf=n_rbf, n_out=3)


@pytest.mark.slow
def test_forward_and_grad(ensemble_batch):
    sets, ge = ensemble_batch
    cfg = make_cfg(ge)
    params, state = ensemble_init(jax.random.PRNGKey(0), cfg)
    batch = collate_ensemble(sets, num_nodes=8, max_conformers=4)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    out, _ = jax.jit(
        lambda p, b: ensemble_apply(p, state, cfg, b, training=True)
    )(params, jb)
    assert out.shape == (len(SMILES), 3)
    assert bool(jnp.isfinite(out).all())

    def loss(p):
        o, _ = ensemble_apply(p, state, cfg, jb, training=True)
        return (o ** 2).mean()

    g = jax.grad(loss)(params)
    assert all(bool(jnp.isfinite(l).all()) for l in jax.tree.leaves(g))
    # the sequence GRU receives gradient
    assert float(jnp.abs(g["seq_gru"]["w_ih"]).sum()) > 0


def test_conformer_mask_skips_missing(ensemble_batch):
    sets, ge = ensemble_batch
    cfg = make_cfg(ge)
    params, state = ensemble_init(jax.random.PRNGKey(0), cfg)
    batch = collate_ensemble(sets, num_nodes=8, max_conformers=4)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    out1, _ = ensemble_apply(params, state, cfg, jb, training=True)
    # poison the e_dist of MASKED conformer slots: output must not change
    poisoned = dict(jb)
    pad = 1.0 - np.asarray(jb["conf_mask"])
    poisoned["e_dist"] = jb["e_dist"] + 99.0 * jnp.asarray(
        pad[:, :, None, None])
    out2, _ = ensemble_apply(params, state, cfg, poisoned, training=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               atol=1e-5)


def test_rbf_expansion_properties():
    cfg = EnsembleConfig(
        mpnn=models.MPNNConfig(node_features=4, edge_features=6,
                               message_features=4, output_dim=4),
        n_rbf=6, r_cut=3.0)
    d = jnp.asarray([[0.0, 1.5], [1.5, 0.0]])
    adj = jnp.asarray([[0.0, 1.0], [1.0, 0.0]])
    out = expand_distances(d, adj, cfg)
    assert out.shape == (2, 2, 6)
    assert float(out[0, 0].sum()) == 0.0       # off-bond zeroed
    assert float(out[0, 1].max()) > 0.5        # in-range distance activates


def test_bn1d_rejected():
    with pytest.raises(ValueError, match="running-stat"):
        EnsembleConfig(
            mpnn=models.MPNNConfig(node_features=4, edge_features=6,
                                   message_features=4, output_dim=4,
                                   msg_norm="bn1d"))
