"""Production-scale smoke: 10k synthetic drug-like molecules through the
full stack — SMILES parsing/perception → featurize/encode → native packer →
packed TPU training — with throughput for each stage.

Run: python scripts/scale_smoke.py            (TPU)
     JAX_PLATFORMS=cpu python scripts/scale_smoke.py --n 2000 (CPU)
"""

import argparse
import json
import random
import sys
import time

sys.path.insert(0, ".")

FRAGMENTS = [
    "CC", "CCC", "C(C)C", "C(=O)O", "C(=O)N", "CO", "CN", "CS", "CCl",
    "c1ccccc1", "c1ccncc1", "c1ccc2ccccc2c1", "C1CCCCC1", "C1CCOC1",
    "c1cc[nH]1? ", "C(F)(F)F", "N(C)C", "OC", "C#N", "C=C",
]
CLEAN_FRAGMENTS = [f for f in FRAGMENTS if "?" not in f and " " not in f]


def random_smiles(rng: random.Random) -> str:
    n = rng.randint(2, 6)
    return "".join(rng.choice(CLEAN_FRAGMENTS) for _ in range(n))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=10000)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--steps", type=int, default=30)
    args = p.parse_args()

    import numpy as np
    from mpnn_tpu import graphs as G

    rng = random.Random(317)
    smiles = [random_smiles(rng) for _ in range(args.n)]

    t0 = time.perf_counter()
    gs = G.generate_molgraphs(smiles, [0.0] * len(smiles))
    t_parse = time.perf_counter() - t0
    n_ok = len(gs)
    atoms = sum(g.num_atoms for g in gs)

    t0 = time.perf_counter()
    gs, ge = G.encode_molgraphs(gs)
    t_encode = time.perf_counter() - t0

    for i, g in enumerate(gs):
        g.label = 0.01 * (i % 97)

    from mpnn_tpu import native
    loader = G.GraphLoader(gs, args.batch, shuffle=True, collate="packed",
                           drop_last=True)
    t0 = time.perf_counter()
    batches = list(loader)
    t_collate = time.perf_counter() - t0

    # training throughput on device
    import dataclasses
    import jax
    import jax.numpy as jnp
    from mpnn_tpu import models
    from mpnn_tpu.train import trainer
    from mpnn_tpu.train.optim import adam

    nf = ge.atom_width()
    cfg = models.build("lipo", afm=nf, bfm=ge.bond_width(), nafm=3, n_out=1)
    tcfg = trainer.TrainConfig(epochs=1, batch_size=args.batch, loss="mse",
                               packed=True)
    params, state = models.network_init(jax.random.PRNGKey(0), cfg)
    tx = adam(1e-3)
    opt_state = tx.init(params)
    step = trainer.make_train_step(cfg, tx, "mse")
    edges_done = 0
    # compile on the first batch shape
    jb = {k: jnp.asarray(v) for k, v in batches[0].items()}
    l, params, state, opt_state = step(params, state, opt_state, jb)
    jax.block_until_ready(l)
    t0 = time.perf_counter()
    n_steps = 0
    for batch in batches[:args.steps]:
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        l, params, state, opt_state = step(params, state, opt_state, jb)
        edges_done += int(np.asarray(batch["edge_mask"]).sum())
        n_steps += 1
    jax.block_until_ready(l)
    t_train = time.perf_counter() - t0

    print(json.dumps({
        "molecules": args.n,
        "parsed_ok": n_ok,
        "atoms": atoms,
        "parse_mols_per_s": round(n_ok / t_parse, 1),
        "encode_mols_per_s": round(n_ok / t_encode, 1),
        "native_packer": native.available(),
        "collate_batches_per_s": round(len(batches) / t_collate, 1),
        "train_steps": n_steps,
        "train_edge_msgs_per_s": round(
            edges_done * cfg.mpnn.message_steps / t_train, 1),
        "final_loss": float(l),
    }))


if __name__ == "__main__":
    main()
