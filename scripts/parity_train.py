"""Quality-parity check (BASELINE.md "Lipo RMSE parity" row).

Trains mpnn_tpu's flagship lipo config AND the PyTorch restatement of the
reference semantics (scripts/measure_baseline_torch.py::DenseLipoModel —
reference: /root/reference/test_lipo.py:103-152, models/lipo_basic_model.py)
on the SAME synthetic regression dataset with the SAME dims / batch size /
optimizer, at the FULL flagship configuration (×50 weight-shared edge-MLP
tail, 6 message steps), and compares held-out RMSE.

The real Lipophilicity CSV isn't present in this container; the synthetic
target is a deterministic per-molecule property (logP-ish composition of
atom counts) so both frameworks chase the same function — dataset-portable
parity evidence. Molecules: the fixed panel plus N random drug-like
fragment compositions (scripts/scale_smoke.py generator).

Run: PYTHONPATH=/root/.axon_site:. JAX_PLATFORMS=cpu \
         python scripts/parity_train.py [--n 4000] [--epochs 6] [--bs 16]
"""

import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


SMILES = [
    "CCO", "CCCO", "CCCCO", "CC(C)O", "CCC(C)O", "c1ccccc1O", "CC(=O)O",
    "CCC(=O)O", "CCN", "CCCN", "CC(C)N", "c1ccccc1N", "CCOC", "CCOCC",
    "c1ccncc1", "CC(C)(C)O", "CCS", "CCCS", "CCCl", "CCBr",
    "CC(C)Cc1ccc(cc1)C(C)C(=O)O", "CN1C=NC2=C1C(=O)N(C(=O)N2C)C",
    "CC(=O)Oc1ccccc1C(=O)O", "c1ccc2ccccc2c1", "NC(=O)c1ccccc1",
    "OC(=O)c1ccccc1O", "ClCCCl", "BrCCBr", "CCCCCCCC", "CC(C)CC(C)(C)C",
    "c1ccccc1CC", "c1ccccc1CCO", "CCCCN", "CCCCS", "COC(=O)C",
    "CCOC(=O)C", "CC(=O)NC", "CCC(=O)NC", "c1ccccc1C(=O)O", "C1CCOC1",
]


def synth_label(mol):
    """Deterministic logP-ish proxy: carbons push up, heteroatoms pull
    down, aromatic rings add a bit."""
    c = sum(1 for a in mol.atoms if a.atomic_num == 6)
    het = sum(1 for a in mol.atoms if a.atomic_num in (7, 8))
    aro = sum(1 for a in mol.atoms if a.aromatic)
    return 0.35 * c - 0.55 * het + 0.08 * aro


def build_dataset(n_random: int, seed: int = 317):
    from mpnn_tpu import chem, graphs as G
    from scripts.scale_smoke import random_smiles

    rng = random.Random(seed)
    smiles = list(SMILES) + [random_smiles(rng) for _ in range(n_random)]
    mols, keep = [], []
    for s in smiles:
        try:
            m = chem.parse_smiles(s)
        except Exception:
            continue
        if m is not None:
            mols.append(m)
            keep.append(s)
    labels = [synth_label(m) for m in mols]
    gs = G.generate_molgraphs(keep, labels)
    gs, ge = G.encode_molgraphs(gs)
    for g, lab in zip(gs, labels):
        g.label = float(lab)
    # deterministic 80/20 split
    idx = np.random.RandomState(seed).permutation(len(gs))
    cut = int(0.8 * len(gs))
    tr = [gs[i] for i in idx[:cut]]
    va = [gs[i] for i in idx[cut:]]
    return tr, va, ge


def build_full_torch(afm_w, nafm_w, ef, out_dim, tail, steps):
    """FAITHFUL torch restatement of the ENTIRE reference lipo driver model
    (test_lipo.py:123-129): graph-norm wrapper (masked BN on nafm,
    graph_norm_wrapper.py:13) → lipo MPNN → BatchNorm1d → halving head,
    with the reference init (kaiming Linears, xavier-sigmoid GRU —
    lipo_basic_model.py:88-107)."""
    import torch
    import torch.nn as nn
    from scripts.measure_baseline_torch import DenseLipoModel

    nf = afm_w + nafm_w
    core = DenseLipoModel(nf, ef, nf, out_dim, tail=tail, steps=steps)
    # reference GRUCell init: xavier-uniform(sigmoid gain = 1.0)
    for wname in ("w_ih", "w_hh"):
        w = getattr(core, wname)
        nn.init.xavier_uniform_(w.data.T, gain=1.0)
    dense = []
    den = out_dim
    while den > 10:
        nd = int(np.ceil(den / 2))
        dense += [nn.Linear(den, nd), nn.ReLU()]
        den = nd
    dense.append(nn.Linear(den, 1))

    class Full(nn.Module):
        def __init__(self):
            super().__init__()
            self.core = core
            self.nafm_w = nn.Parameter(torch.ones(nafm_w))
            self.nafm_b = nn.Parameter(torch.zeros(nafm_w))
            self.bn = nn.BatchNorm1d(out_dim)
            self.head = nn.Sequential(*dense)

        def forward(self, afm, nafm, bfm, adj, mask):
            nafm = self.core.masked_bn(nafm, mask, self.nafm_w, self.nafm_b)
            x = torch.cat([afm, nafm], -1)
            return self.head(self.bn(self.core(x, bfm, adj, mask)))

    model = Full()

    def initw(m):
        if type(m) == nn.Linear:
            nn.init.kaiming_uniform_(m.weight, nonlinearity="relu")
            if m.bias is not None:
                nn.init.constant_(m.bias, 0.0)
    model.apply(initw)
    return model


def transplant_torch_to_jax(tm, params):
    """Copy the faithful torch full-driver weights (build_full_torch) into a
    network_init(params) tree — the two models then compute IDENTICAL
    functions (verified to ~1e-6 by tests/test_parity_lockstep.py), which is
    the gold-standard parity evidence: same weights → same losses."""
    import jax.numpy as jnp

    def t2j(t):
        # .copy() is load-bearing: t.detach().numpy() SHARES memory with the
        # torch tensor and jnp.asarray on CPU is zero-copy — without it the
        # torch optimizer's in-place updates would mutate the jax params
        return jnp.asarray(t.detach().numpy().copy())

    import torch
    core = tm.core
    m = params["mpnn"]["message"][0]
    m["head"] = [{"w": t2j(l.weight).T, "b": t2j(l.bias)}
                 for l in core.head]
    m["shared"] = {"w": t2j(core.shared.weight).T}
    m["final"] = {"w": t2j(core.final.weight).T, "b": t2j(core.final.bias)}
    m["message_bias"] = t2j(core.message_bias)
    params["mpnn"]["gru"] = {
        "w_ih": t2j(core.w_ih), "w_hh": t2j(core.w_hh),
        "b_ih": t2j(core.b_ih), "b_hh": t2j(core.b_hh)}
    params["mpnn"]["ma_bn"] = [{"weight": t2j(core.mabn_w),
                                "bias": t2j(core.mabn_b)}]
    params["mpnn"]["bn"] = [{"weight": t2j(core.bn_w),
                             "bias": t2j(core.bn_b)}]
    params["mpnn"]["readout"] = {
        "i": {"w": t2j(core.i_lin.weight).T, "b": t2j(core.i_lin.bias)},
        "j": {"w": t2j(core.j_lin.weight).T, "b": t2j(core.j_lin.bias)}}
    params["nafm_bn"] = {"weight": t2j(tm.nafm_w), "bias": t2j(tm.nafm_b)}
    params["head_bn"] = {"weight": t2j(tm.bn.weight),
                         "bias": t2j(tm.bn.bias)}
    heads = [l for l in tm.head if isinstance(l, torch.nn.Linear)]
    params["head"] = [{"w": t2j(l.weight).T, "b": t2j(l.bias)}
                      for l in heads]
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4000)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--bs", type=int, default=16)       # test_lipo.py bs 16
    ap.add_argument("--tail", type=int, default=50)     # edge_network.py:20
    ap.add_argument("--seed", type=int, default=317)    # test_lipo.py seed
    args = ap.parse_args()

    tr, va, ge = build_dataset(args.n, args.seed)
    y_va = np.asarray([g.label for g in va], np.float32)
    label_std = float(np.std([g.label for g in tr + va]))

    # ---- ours: full driver config (lipo network incl. halving head) ------
    # Both sides start from the SAME initial weights (the torch draw,
    # transplanted): the ×50 weight-shared relu tail's output scale is a
    # SEED LOTTERY under the reference init (spectral radius of one shared
    # matrix raised to the 50th power), so independent draws measure luck,
    # not framework quality. tests/test_parity_lockstep.py proves the
    # transplanted models compute identical functions.
    import dataclasses
    import torch
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from mpnn_tpu.models import build as build_net, network_init
    from mpnn_tpu.models.network import network_apply_packed
    from mpnn_tpu.train import trainer
    from mpnn_tpu import graphs as G

    cfg = build_net("lipo", afm=ge.atom_width(), bfm=ge.bond_width(),
                    nafm=3, n_out=1)
    m = dataclasses.replace(cfg.mpnn, edge_mlp_tail_repeats=args.tail,
                            message_steps=6)
    cfg = dataclasses.replace(cfg, mpnn=m)

    out_dim = 2 * ge.atom_width()
    torch.manual_seed(args.seed)
    full_t = build_full_torch(ge.atom_width(), 3, ge.bond_width(), out_dim,
                              args.tail, 6)
    params, state = network_init(jax.random.PRNGKey(args.seed), cfg)
    params = transplant_torch_to_jax(full_t, params)

    tcfg = trainer.TrainConfig(epochs=args.epochs, batch_size=args.bs,
                               learning_rate=1e-2, weight_decay=1e-4,
                               loss="mse", packed=True, plateau=True,
                               seed=args.seed, shuffle=True)
    t0 = time.time()
    params, state, _, hist = trainer.train(cfg, tcfg, tr, va,
                                           params=params, state=state)
    ours_t = time.time() - t0

    # held-out RMSE in TRAINING mode (batch statistics) — the torch
    # restatement's masked BN has no running stats, so apples-to-apples
    full = G.collate_packed(va).as_dict()
    jb = {k: jnp.asarray(v) for k, v in full.items() if k != "num_graphs"}
    out, _ = network_apply_packed(params, state, cfg, jb, training=True)
    ours_rmse = float(np.sqrt(np.mean((np.asarray(out)[:, 0] - y_va) ** 2)))

    # ---- torch restatement: FULL faithful driver (same init weights) -----
    from scripts.measure_baseline_torch import DenseLipoModel
    ncap = max(g.num_atoms for g in tr + va)
    ncap = int(-(-ncap // 8) * 8)

    def torch_batch(graphs):
        b = G.collate_dense(graphs, num_nodes=ncap)
        return (torch.from_numpy(b["afm"]), torch.from_numpy(b["nafm"]),
                torch.from_numpy(b["bfm"]), torch.from_numpy(b["adj"]),
                torch.from_numpy(b["mask"]),
                torch.tensor([g.label for g in graphs],
                             dtype=torch.float32)[:, None])

    def train_torch(model, fwd):
        opt = torch.optim.Adam(model.parameters(), lr=1e-2,
                               weight_decay=1e-4)
        gen = torch.Generator().manual_seed(args.seed)
        t0 = time.time()
        n = len(tr)
        for _ in range(args.epochs):
            perm = torch.randperm(n, generator=gen)
            for s in range(0, n, args.bs):
                graphs = [tr[i] for i in perm[s:s + args.bs]]
                batch = torch_batch(graphs)
                opt.zero_grad()
                ((fwd(model, batch) - batch[-1]) ** 2).mean().backward()
                opt.step()
        dt = time.time() - t0
        # evaluate in TRAIN mode batch-stats on the full val set (same rule
        # as ours: the masked BNs have no running-stat eval path)
        with torch.no_grad():
            preds = []
            for s in range(0, len(va), 512):
                batch = torch_batch(va[s:s + 512])
                preds.append(fwd(model, batch).detach().numpy()[:, 0])
        rmse = float(np.sqrt(np.mean((np.concatenate(preds) - y_va) ** 2)))
        return rmse, dt

    torch_full_rmse, torch_full_t = train_torch(
        full_t, lambda m, b: m(*b[:5]))

    # ---- matched-core comparison (MPNN straight to 1 output, both sides) -
    core_t = DenseLipoModel(cfg.mpnn.node_features, ge.bond_width(),
                            cfg.mpnn.node_features, 1, tail=args.tail,
                            steps=6)
    torch_core_rmse, torch_core_t = train_torch(
        core_t, lambda m, b: m(torch.cat([b[0], b[1]], -1), *b[2:5]))

    import optax
    from mpnn_tpu import models as M
    from mpnn_tpu.models.sparse import sparse_mpnn_apply
    from mpnn_tpu.train.optim import adam as jadam
    nf2 = cfg.mpnn.node_features
    cfg2 = M.MPNNConfig(node_features=nf2, edge_features=ge.bond_width(),
                        message_features=nf2, output_dim=1, message_steps=6,
                        msg_norm="bn1d", state_norm="bn1d",
                        edge_mlp_tail_repeats=args.tail)
    p2, s2 = M.mpnn_init(jax.random.PRNGKey(args.seed), cfg2)
    tx2 = jadam(1e-2, weight_decay=1e-4)
    o2 = tx2.init(p2)

    @jax.jit
    def step2(p, s, o, b):
        def lf(p, s):
            bb = {k: v for k, v in b.items() if k != "num_graphs"}
            bb["node_feats"] = jnp.concatenate(
                [bb["node_feats"], bb["node_nafm"]], -1)
            out, ns = sparse_mpnn_apply(p, s, cfg2, bb, training=True)
            gm = b["graph_mask"][:, None]
            per = ((out - b["labels"][:, None].astype(out.dtype)) ** 2) * gm
            return per.sum() / gm.sum(), ns
        (l, ns), g = jax.value_and_grad(lf, has_aux=True)(p, s)
        u, o_ = tx2.update(g, o, p)
        return l, optax.apply_updates(p, u), ns, o_

    ld = trainer.GraphLoader(tr, args.bs, shuffle=True, seed=args.seed,
                             collate="packed")
    t0 = time.time()
    for _ in range(args.epochs):
        for b in ld:
            jb2 = {k: jnp.asarray(v) if not np.isscalar(v) else v
                   for k, v in b.items()}
            _, p2, s2, o2 = step2(p2, s2, o2, jb2)
    ours_core_t = time.time() - t0
    vb = G.collate_packed(va).as_dict()
    vb["node_feats"] = np.concatenate([vb["node_feats"], vb["node_nafm"]],
                                      -1)
    jvb = {k: jnp.asarray(v) for k, v in vb.items() if k != "num_graphs"}
    out2, _ = sparse_mpnn_apply(p2, s2, cfg2, jvb, training=True)
    ours_core_rmse = float(np.sqrt(np.mean(
        (np.asarray(out2)[:, 0] - y_va) ** 2)))

    print(json.dumps({
        "n_train": len(tr), "n_val": len(va),
        "epochs": args.epochs, "batch_size": args.bs,
        "tail_repeats": args.tail, "label_std": round(label_std, 3),
        "full_driver": {
            "mpnn_tpu_val_rmse": round(ours_rmse, 4),
            "torch_reference_val_rmse": round(torch_full_rmse, 4),
            "mpnn_tpu_train_s": round(ours_t, 1),
            "torch_train_s": round(torch_full_t, 1),
        },
        "matched_core": {
            "mpnn_tpu_val_rmse": round(ours_core_rmse, 4),
            "torch_reference_val_rmse": round(torch_core_rmse, 4),
            "mpnn_tpu_train_s": round(ours_core_t, 1),
            "torch_train_s": round(torch_core_t, 1),
        },
    }))


if __name__ == "__main__":
    main()
