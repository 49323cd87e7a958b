"""End-to-end 3D conformer-ensemble training demo — the pipeline the
reference designed but never built (thoughts.txt), complete:

    SMILES → conformers (distance geometry, energy-sorted, RMSD-deduped)
           → per-conformer MPNN with RBF distance features
           → GRU over the conformer sequence → regression head → Adam.

Run: JAX_PLATFORMS=cpu python scripts/train_ensemble_demo.py
"""

import json
import sys
import time

sys.path.insert(0, ".")
import os
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mpnn_tpu import chem, graphs as G, models
from mpnn_tpu.graphs.graph import from_mol_3d
from mpnn_tpu.models.ensemble import (
    EnsembleConfig, collate_ensemble, ensemble_apply, ensemble_init,
)
from mpnn_tpu.train.optim import adam

SMILES = ["CCO", "CCCO", "CCCC", "CC(C)O", "CCC(C)O", "CCCCO",
          "CC(C)CC", "CCOC", "CCCN", "CC(C)N", "CCCCC", "CCOCC"]


def main():
    t0 = time.time()
    sets, labels = [], []
    for i, s in enumerate(SMILES):
        mol = chem.parse_smiles(s)
        y_i = 0.3 * s.count("C") - 0.6 * s.count("O")
        confs = from_mol_3d(mol, label=y_i, n_conf=6, seed=i)
        sets.append(confs)
        labels.append(y_i)
    t_conf = time.time() - t0
    n_confs = sum(len(cs) for cs in sets)

    ge = G.fit_encoders([cs[0] for cs in sets])
    for cs in sets:
        for g in cs:
            g.encode(ge)

    n_rbf = 6
    cfg = EnsembleConfig(
        mpnn=models.MPNNConfig(
            node_features=ge.atom_width(),
            edge_features=ge.bond_width() + n_rbf,
            message_features=ge.atom_width(), output_dim=8,
            message_steps=3, edge_mlp_tail_repeats=4,
            state_norm="stateless"),
        max_conformers=6, n_rbf=n_rbf, n_out=1)
    params, state = ensemble_init(jax.random.PRNGKey(317), cfg)
    batch = collate_ensemble(sets, num_nodes=16, max_conformers=6)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    y = jnp.asarray(np.asarray(labels, np.float32))

    tx = adam(5e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out, _ = ensemble_apply(p, state, cfg, jb, training=True)
            return ((out[:, 0] - y) ** 2).mean()
        l, g = jax.value_and_grad(loss_fn)(params)
        u, opt_state2 = tx.update(g, opt_state, params)
        return l, optax.apply_updates(params, u), opt_state2

    l0 = None
    for i in range(60):
        l, params, opt_state = step(params, opt_state)
        if l0 is None:
            l0 = float(l)
    print(json.dumps({
        "molecules": len(SMILES),
        "conformers": n_confs,
        "conformer_gen_s": round(t_conf, 1),
        "loss_first": round(l0, 4),
        "loss_last": round(float(l), 4),
    }))
    assert float(l) < l0, "ensemble training must reduce the loss"


if __name__ == "__main__":
    main()
