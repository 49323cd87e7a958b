"""Explain the parity-RMSE fork (round-2 VERDICT item 4).

BASELINE.md's parity table showed mpnn_tpu at val RMSE 0.292 vs the
faithful torch restatement at 0.450 after 10 epochs FROM IDENTICAL
transplanted weights. Two implementations of the same algorithm should
not fork 1.5×; this probe isolates the mechanism by controlling, one at
a time, the two ways the original harness was NOT identical:

  1. the LR SCHEDULE — scripts/parity_train.py ran OUR trainer with
     TrainConfig(plateau=True) (ReduceLROnPlateau on val loss, the
     reference driver's scheduler, test_lipo.py:139-140) but trained the
     torch side with PLAIN constant-LR Adam;
  2. the BATCH ORDER — GraphLoader's numpy RandomState(317) shuffle vs
     torch.randperm(Generator(317)) produce different permutations, and
     the BN-heavy flagship is sensitive to batch composition.

Grid: {ours, torch} × {plateau on, off}, torch additionally with OUR
loader's exact batch order. Per-epoch val RMSE (train-mode batch stats,
both sides — the masked BNs' apples-to-apples rule) is printed as JSON.

Run: PYTHONPATH=/root/.axon_site:. JAX_PLATFORMS=cpu \
         python scripts/parity_fork_probe.py [--n 4000] [--epochs 10]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from scripts.parity_train import (build_dataset, build_full_torch,
                                  transplant_torch_to_jax)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4000)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--tail", type=int, default=50)
    ap.add_argument("--seed", type=int, default=317)
    args = ap.parse_args()

    import dataclasses
    import torch
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from mpnn_tpu import graphs as G
    from mpnn_tpu.models import build as build_net, network_init
    from mpnn_tpu.models.network import network_apply_packed
    from mpnn_tpu.train import trainer

    tr, va, ge = build_dataset(args.n, args.seed)
    y_va = np.asarray([g.label for g in va], np.float32)

    cfg = build_net("lipo", afm=ge.atom_width(), bfm=ge.bond_width(),
                    nafm=3, n_out=1)
    cfg = dataclasses.replace(cfg, mpnn=dataclasses.replace(
        cfg.mpnn, edge_mlp_tail_repeats=args.tail, message_steps=6))
    out_dim = 2 * ge.atom_width()

    # capture OUR loader's exact per-epoch batch order so the torch runs
    # can use the identical composition
    twin = G.GraphLoader(tr, args.bs, shuffle=True, seed=args.seed,
                         collate="packed")
    chunk_epochs = [twin._epoch_chunks() for _ in range(args.epochs)]

    def make_pair():
        torch.manual_seed(args.seed)
        full_t = build_full_torch(ge.atom_width(), 3, ge.bond_width(),
                                  out_dim, args.tail, 6)
        params, state = network_init(jax.random.PRNGKey(args.seed), cfg)
        params = transplant_torch_to_jax(full_t, params)
        return full_t, params, state

    # ---- ours, plateau on/off: per-epoch val RMSE ------------------------
    def ours_run(plateau):
        _t, params, state = make_pair()
        tcfg = trainer.TrainConfig(
            epochs=args.epochs, batch_size=args.bs, learning_rate=1e-2,
            weight_decay=1e-4, loss="mse", packed=True, plateau=plateau,
            seed=args.seed, shuffle=True)
        t0 = time.time()
        params, state, _, hist = trainer.train(cfg, tcfg, tr, va,
                                               params=params, state=state)
        full = G.collate_packed(va).as_dict()
        jb = {k: jnp.asarray(v) for k, v in full.items()
              if k != "num_graphs"}
        out, _ = network_apply_packed(params, state, cfg, jb,
                                      training=True)
        rmse = float(np.sqrt(np.mean(
            (np.asarray(out)[:, 0] - y_va) ** 2)))
        return {"final_trainmode_rmse": round(rmse, 4),
                "per_epoch_val_rmse": [round(h.get("val_rmse", np.nan), 4)
                                       for h in hist],
                "final_lr": hist[-1]["lr"], "train_s": round(
                    time.time() - t0, 1)}

    # ---- torch: {plateau on/off} × {our batch order} ---------------------
    ncap = max(g.num_atoms for g in tr + va)
    ncap = int(-(-ncap // 8) * 8)

    def torch_batch(graphs):
        b = G.collate_dense(graphs, num_nodes=ncap)
        return (torch.from_numpy(b["afm"]), torch.from_numpy(b["nafm"]),
                torch.from_numpy(b["bfm"]), torch.from_numpy(b["adj"]),
                torch.from_numpy(b["mask"]),
                torch.tensor([g.label for g in graphs],
                             dtype=torch.float32)[:, None])

    def torch_val_rmse(model):
        with torch.no_grad():
            preds = []
            for s in range(0, len(va), 512):
                batch = torch_batch(va[s:s + 512])
                preds.append(model(*batch[:5]).detach().numpy()[:, 0])
        return float(np.sqrt(np.mean((np.concatenate(preds) - y_va) ** 2)))

    def torch_run(plateau, our_order):
        model, _p, _s = make_pair()
        opt = torch.optim.Adam(model.parameters(), lr=1e-2,
                               weight_decay=1e-4)
        sched = (torch.optim.lr_scheduler.ReduceLROnPlateau(opt)
                 if plateau else None)
        gen = torch.Generator().manual_seed(args.seed)
        t0 = time.time()
        per_epoch = []
        n = len(tr)
        for ep in range(args.epochs):
            if our_order:
                chunks = chunk_epochs[ep]
            else:
                perm = torch.randperm(n, generator=gen)
                chunks = [perm[s:s + args.bs].tolist()
                          for s in range(0, n, args.bs)]
            for idxs in chunks:
                graphs = [tr[i] for i in idxs]
                batch = torch_batch(graphs)
                opt.zero_grad()
                ((model(*batch[:5]) - batch[-1]) ** 2).mean().backward()
                opt.step()
            rmse = torch_val_rmse(model)
            per_epoch.append(round(rmse, 4))
            if sched is not None:
                # our trainer steps the scheduler on the per-epoch val
                # LOSS (mse) — same signal here
                sched.step(rmse ** 2)
        return {"final_trainmode_rmse": per_epoch[-1],
                "per_epoch_val_rmse": per_epoch,
                "final_lr": opt.param_groups[0]["lr"],
                "train_s": round(time.time() - t0, 1)}

    results = {}
    results["ours_plateau"] = ours_run(True)
    print(json.dumps({"ours_plateau": results["ours_plateau"]}),
          flush=True)
    results["ours_plain"] = ours_run(False)
    print(json.dumps({"ours_plain": results["ours_plain"]}), flush=True)
    results["torch_plain_own_order"] = torch_run(False, False)
    print(json.dumps(
        {"torch_plain_own_order": results["torch_plain_own_order"]}),
        flush=True)
    results["torch_plateau_our_order"] = torch_run(True, True)
    print(json.dumps(
        {"torch_plateau_our_order": results["torch_plateau_our_order"]}),
        flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
