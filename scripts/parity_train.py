"""Quality-parity check: train mpnn_tpu's flagship lipo config AND the
PyTorch restatement of the reference semantics on the SAME synthetic
regression dataset / dims / optimizer settings, and compare RMSE
convergence. (The real Lipophilicity CSV isn't present in this container;
the synthetic target is a deterministic per-molecule property so both
frameworks chase the same function. This realizes the BASELINE.md
"Lipo RMSE parity" row as measured, dataset-portable evidence.)

Run: PYTHONPATH=/root/.axon_site:. JAX_PLATFORMS=cpu python scripts/parity_train.py
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")
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


def main(epochs=12, seed=317):
    from mpnn_tpu import chem, graphs as G

    mols = [chem.parse_smiles(s) for s in SMILES]
    labels = [synth_label(m) for m in mols]
    gs = G.generate_molgraphs(SMILES, labels)
    gs, ge = G.encode_molgraphs(gs)
    for g, lab in zip(gs, labels):
        g.label = float(lab)

    # ---- ours (jax, sparse packed path) ---------------------------------
    import dataclasses
    import jax
    jax.config.update("jax_platforms", "cpu")
    from mpnn_tpu.models import build
    from mpnn_tpu.train import trainer

    cfg = build("lipo", afm=ge.atom_width(), bfm=ge.bond_width(),
                nafm=3, n_out=1)
    m = dataclasses.replace(cfg.mpnn, edge_mlp_tail_repeats=10,
                            message_steps=6)
    cfg = dataclasses.replace(cfg, mpnn=m)
    tcfg = trainer.TrainConfig(epochs=epochs, batch_size=8,
                               learning_rate=1e-2, weight_decay=1e-4,
                               loss="mse", packed=True, plateau=True,
                               seed=seed)
    t0 = time.time()
    params, state, _, hist = trainer.train(cfg, tcfg, gs, gs)
    ours_t = time.time() - t0
    # Apples-to-apples with the torch restatement below, whose masked BN has
    # no running stats (it always normalizes with batch statistics): compute
    # the final RMSE in training mode on the full batch.
    import jax.numpy as jnp
    from mpnn_tpu.models.network import network_apply_packed
    full = G.collate_packed(gs).as_dict()
    jb = {k: jnp.asarray(v) for k, v in full.items() if k != "num_graphs"}
    out, _ = network_apply_packed(params, state, cfg, jb, training=True)
    ours_rmse = float(np.sqrt(np.mean(
        (np.asarray(out)[:, 0] - np.asarray(labels)) ** 2)))

    # ---- torch restatement of the reference semantics --------------------
    import torch
    from scripts.measure_baseline_torch import DenseLipoModel
    torch.manual_seed(seed)
    batch = G.collate_dense(gs, num_nodes=32)
    afm = np.concatenate([batch["afm"], batch["nafm"]], axis=-1)
    t_afm = torch.from_numpy(afm)
    t_bfm = torch.from_numpy(batch["bfm"])
    t_adj = torch.from_numpy(batch["adj"])
    t_mask = torch.from_numpy(batch["mask"])
    y = torch.tensor(labels, dtype=torch.float32)[:, None]
    nf = cfg.mpnn.node_features
    model = DenseLipoModel(nf, ge.bond_width(), nf, 1, tail=10, steps=6)
    opt = torch.optim.Adam(model.parameters(), lr=1e-2, weight_decay=1e-4)
    t0 = time.time()
    n = len(gs)
    steps_per_epoch = (n + 7) // 8
    for _ in range(epochs):
        perm = torch.randperm(n)
        for s in range(0, n, 8):
            idx = perm[s:s + 8]
            opt.zero_grad()
            out = model(t_afm[idx], t_bfm[idx], t_adj[idx], t_mask[idx])
            loss = ((out - y[idx]) ** 2).mean()
            loss.backward()
            opt.step()
    with torch.no_grad():
        pred = model(t_afm, t_bfm, t_adj, t_mask)
        torch_rmse = float(((pred - y) ** 2).mean().sqrt())
    torch_t = time.time() - t0

    # ---- matched-architecture run (readout straight to 1, like the torch
    # restatement above — isolates framework convergence from the full
    # driver head stack, which is deeper and slower on tiny data) ----------
    import jax.numpy as jnp2
    import optax
    from mpnn_tpu import models as M
    from mpnn_tpu.models.sparse import sparse_mpnn_apply
    from mpnn_tpu.train.optim import adam as jadam
    nf2 = ge.atom_width() + 3
    cfg2 = M.MPNNConfig(node_features=nf2, edge_features=ge.bond_width(),
                        message_features=nf2, output_dim=1, message_steps=6,
                        msg_norm="bn1d", state_norm="bn1d",
                        edge_mlp_tail_repeats=10)
    p2, s2 = M.mpnn_init(jax.random.PRNGKey(seed), cfg2)
    packed = G.collate_packed(gs).as_dict()
    packed["node_feats"] = np.concatenate(
        [packed["node_feats"], packed["node_nafm"]], -1)
    jb2 = {k: jnp2.asarray(v) for k, v in packed.items()
           if k != "num_graphs"}
    yj = jnp2.asarray(np.asarray(labels, np.float32))
    tx2 = jadam(1e-2, weight_decay=1e-4)
    o2 = tx2.init(p2)

    @jax.jit
    def step2(p, s, o):
        def lf(p):
            out, ns = sparse_mpnn_apply(p, s, cfg2, jb2, training=True)
            return ((out[:, 0] - yj) ** 2).mean(), ns
        (l, ns), g = jax.value_and_grad(lf, has_aux=True)(p)
        u, o2_ = tx2.update(g, o, p)
        return l, optax.apply_updates(p, u), ns, o2_

    n_steps = epochs * steps_per_epoch
    for _ in range(n_steps):
        l2, p2, s2, o2 = step2(p2, s2, o2)
    matched_rmse = float(np.sqrt(float(l2)))

    label_std = float(np.std(labels))
    print(json.dumps({
        "epochs": epochs,
        "label_std": round(label_std, 3),
        "mpnn_tpu_full_driver_config_rmse": round(float(ours_rmse), 4),
        "mpnn_tpu_matched_arch_rmse": round(matched_rmse, 4),
        "torch_reference_rmse": round(torch_rmse, 4),
        "mpnn_tpu_train_s": round(ours_t, 1),
        "torch_train_s": round(torch_t, 1),
    }))


if __name__ == "__main__":
    main()
