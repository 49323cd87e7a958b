"""Quickstart: the whole framework in one script.

Run (CPU):  JAX_PLATFORMS=cpu python examples/quickstart.py
Run (TPU):  python examples/quickstart.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mpnn_tpu import chem, graphs, models
from mpnn_tpu.train import trainer

# ---------------------------------------------------------------------------
# 1. Chemistry: parse SMILES, no RDKit needed
# ---------------------------------------------------------------------------
caffeine = chem.parse_smiles("CN1C=NC2=C1C(=O)N(C(=O)N2C)C")
print(f"caffeine: {caffeine.num_atoms()} atoms, "
      f"{sum(a.aromatic for a in caffeine.atoms)} aromatic, "
      f"{len(caffeine.rings)} rings")

# ---------------------------------------------------------------------------
# 2. Dataset: molecules + labels → encoded graphs
# ---------------------------------------------------------------------------
smiles = ["CCO", "CCCO", "CCCCO", "CC(C)O", "CCC(C)O", "c1ccccc1O",
          "CC(=O)O", "CCC(=O)O", "CCN", "CCCN", "CC(C)N", "c1ccccc1N",
          "CCOC", "CCOCC", "c1ccncc1", "CC(C)(C)O", "CCS", "CCCS"]
labels = [0.2 * s.count("C") - 0.5 * (s.count("O") + s.count("N"))
          for s in smiles]
gs = graphs.generate_molgraphs(smiles, labels)
gs, ge = graphs.encode_molgraphs(gs)
print(f"dataset: {len(gs)} graphs, atom width {ge.atom_width()}, "
      f"bond width {ge.bond_width()}")

# ---------------------------------------------------------------------------
# 3. Model: the flagship lipo config from the zoo (or build your own
#    MPNNConfig — message fn × aggregation × norms × readout)
# ---------------------------------------------------------------------------
cfg = models.build("lipo", afm=ge.atom_width(), bfm=ge.bond_width(),
                   nafm=3, n_out=1)
# shrink the compat constants for a fast demo
m = dataclasses.replace(cfg.mpnn, edge_mlp_tail_repeats=5, message_steps=3)
cfg = dataclasses.replace(cfg, mpnn=m)

# ---------------------------------------------------------------------------
# 4. Train on the sparse packed path (TPU-native O(E) message passing)
# ---------------------------------------------------------------------------
tcfg = trainer.TrainConfig(epochs=15, batch_size=6, learning_rate=1e-2,
                           weight_decay=1e-4, loss="mse", packed=True,
                           plateau=True)
params, state, _, hist = trainer.train(cfg, tcfg, gs, gs)
print(f"train loss {hist[0]['train_loss']:.3f} → "
      f"{hist[-1]['train_loss']:.3f}; "
      f"val RMSE {hist[-1]['val_rmse']:.3f}")

# ---------------------------------------------------------------------------
# 5. Predict on new molecules
# ---------------------------------------------------------------------------
new = graphs.generate_molgraphs(["CCCCN", "c1ccccc1CCO"], [0.0, 0.0])
for g in new:
    g.encode(ge)
batch = graphs.collate_dense(new)
jb = {k: jnp.asarray(v) for k, v in batch.items()}
out, _ = models.network_apply(params, state, cfg, jb, training=False)
for s, y in zip(["CCCCN", "c1ccccc1CCO"], np.asarray(out)[:, 0]):
    print(f"predict {s}: {y:+.3f}")

# ---------------------------------------------------------------------------
# 6. Scale: the same training step over a device mesh (DP × edge partition)
#    — see parallel/ and __graft_entry__.dryrun_multichip
# ---------------------------------------------------------------------------
print(f"devices: {jax.devices()}")
