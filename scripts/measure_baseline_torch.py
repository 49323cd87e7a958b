"""Measure the BASELINE: dense reference-semantics training step in PyTorch
(CPU), same flagship dims/batch as bench.py. The reference publishes no
numbers (BASELINE.md), so this restatement IS the baseline.

This is a fresh restatement of the documented semantics (SURVEY.md §2.3-2.4,
lipo config: shared EdgeNetwork message fused with aggregation, masked BN on
messages and states, masked GRU, gated readout), not a copy of the
reference's files. Run: python scripts/measure_baseline_torch.py
"""

import json
import sys
import time

import numpy as np
import torch
import torch.nn as nn

sys.path.insert(0, ".")
from bench import build_batch, flagship_mpnn_cfg  # noqa: E402


class DenseLipoModel(nn.Module):
    """Reference lipo semantics: edge-MLP → (B, N·mf, N·nf) block bmm
    (precomputed once per forward), 6 shared steps of msg → maskedBN →
    GRU → maskedBN, gated readout."""

    def __init__(self, nf, ef, mf, out_dim, tail=50, steps=6):
        super().__init__()
        self.nf, self.ef, self.mf, self.steps, self.tail = nf, ef, mf, steps, tail
        dims = []
        in_layer = ef
        while in_layer ** 2 < nf * mf:
            dims.append((in_layer, in_layer ** 2))
            in_layer = in_layer ** 2
        self.head = nn.ModuleList([nn.Linear(a, b) for a, b in dims])
        self.shared = nn.Linear(in_layer, in_layer, bias=False)
        self.final = nn.Linear(in_layer, nf * mf)
        self.message_bias = nn.Parameter(torch.zeros(mf))
        self.w_ih = nn.Parameter(torch.randn(mf, 3 * nf) * 0.1)
        self.w_hh = nn.Parameter(torch.randn(nf, 3 * nf) * 0.1)
        self.b_ih = nn.Parameter(torch.zeros(3 * nf))
        self.b_hh = nn.Parameter(torch.zeros(3 * nf))
        self.bn_w = nn.Parameter(torch.ones(nf))
        self.bn_b = nn.Parameter(torch.zeros(nf))
        self.mabn_w = nn.Parameter(torch.ones(mf))
        self.mabn_b = nn.Parameter(torch.zeros(mf))
        self.i_lin = nn.Linear(2 * nf, out_dim)
        self.j_lin = nn.Linear(2 * nf, out_dim)

    def masked_bn(self, x, mask, w, b, eps=1e-5):
        m = mask.reshape(-1, 1)
        y = x.reshape(-1, x.shape[-1])
        mean = (y * m).sum(0) / m.sum()
        var = (((y - mean) * m) ** 2).sum(0) / m.sum()
        y = (y - mean) / (var.sqrt() + eps)
        return ((w * y + b) * m).reshape(x.shape)

    def forward(self, afm, bfm, adj, mask):
        B, N, _ = afm.shape
        pen = bfm.reshape(-1, self.ef)
        for l in self.head:
            pen = torch.relu(l(pen))
        for _ in range(self.tail):
            pen = torch.relu(self.shared(pen))
        a = self.final(pen).reshape(B, N, N, self.mf, self.nf)
        block = a.permute(0, 1, 3, 2, 4).contiguous().reshape(
            B, N * self.mf, N * self.nf)
        h = afm
        for _ in range(self.steps):
            msgs = block.bmm(afm.reshape(B, N * self.nf, 1)).reshape(
                B, N, self.mf) + self.message_bias
            msgs = self.masked_bn(msgs, mask, self.mabn_w, self.mabn_b)
            m = mask.reshape(-1, 1)
            rzn_i = msgs.reshape(-1, self.mf) @ self.w_ih + self.b_ih
            rzn_h = h.reshape(-1, self.nf) @ self.w_hh + self.b_hh
            ri, zi, ni = rzn_i.chunk(3, -1)
            rh, zh, nh = rzn_h.chunk(3, -1)
            r = torch.sigmoid(ri + rh) * m
            z = torch.sigmoid(zi + zh) * m
            n = torch.tanh(ni + r * nh) * m
            h = (((1 - z) * n + z * h.reshape(-1, self.nf)) * m).reshape(
                B, N, self.nf)
            h = self.masked_bn(h, mask, self.bn_w, self.bn_b)
        x = torch.cat([h, afm], -1) * mask
        gated = torch.softmax(self.i_lin(x), -1) * self.j_lin(x) * mask
        return gated.sum(1)


def main():
    batch_size, iters = 256, 10
    gs, ge = build_batch(batch_size)
    cfg = flagship_mpnn_cfg(ge)
    from mpnn_tpu import graphs as G
    batch = G.collate_dense(gs, num_nodes=32)
    afm = np.concatenate([batch["afm"], batch["nafm"]], axis=-1)
    t_afm = torch.from_numpy(afm)
    t_bfm = torch.from_numpy(batch["bfm"])
    t_adj = torch.from_numpy(batch["adj"])
    t_mask = torch.from_numpy(batch["mask"])
    real_edges = int(batch["adj"].sum())

    model = DenseLipoModel(cfg.node_features, cfg.edge_features,
                           cfg.message_features, cfg.output_dim)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3, weight_decay=1e-4)
    labels = torch.randn(len(gs), cfg.output_dim)

    def step():
        opt.zero_grad()
        out = model(t_afm, t_bfm, t_adj, t_mask)
        loss = ((out - labels) ** 2).mean()
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = time.perf_counter() - t0
    edge_msgs = real_edges * cfg.message_steps * iters
    print(json.dumps({
        "baseline_metric": "edge_messages_per_s_train_step_dense_torch_cpu",
        "value": round(edge_msgs / dt, 1),
        "real_edges": real_edges,
        "secs_per_step": dt / iters,
    }))


if __name__ == "__main__":
    main()
