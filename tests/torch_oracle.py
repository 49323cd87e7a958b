"""Minimal PyTorch restatement of the reference numerics, used ONLY as a test
oracle (SURVEY.md §4 item 1: per-op allclose against a reference-semantics
restatement). This is a fresh implementation of the documented semantics —
shapes and math per SURVEY.md §2.3 — not a copy of the reference files.

Each oracle takes explicit weight arrays (the same arrays handed to the JAX
op) so the comparison is exact up to float reassociation.
"""

import numpy as np
import torch
import torch.nn.functional as F


def t(x):
    return torch.from_numpy(np.asarray(x))


def edge_mlp_penultimate(head_ws, head_bs, shared_w, e, tail_repeats=50):
    """Width-squaring head + tail_repeats applications of one shared
    bias-free square layer, ReLU activations throughout."""
    x = t(e)
    for w, b in zip(head_ws, head_bs):
        x = torch.relu(x @ t(w) + t(b))
    for _ in range(tail_repeats):
        x = torch.relu(x @ t(shared_w))
    return x


def edge_network_fused(head_ws, head_bs, shared_w, final_w, final_b,
                       message_bias, afm, bfm, nf, mf, tail_repeats=50):
    """m[b,v] = Σ_w reshape(final(P_vw), (mf,nf)) · h_w + message_bias,
    computed the reference way: assemble the (B, N·mf, N·nf) block matrix and
    bmm with flattened node states (edge_network.py:30-51)."""
    B, N, _ = afm.shape
    pen = edge_mlp_penultimate(head_ws, head_bs, shared_w,
                               bfm.reshape(-1, bfm.shape[-1]), tail_repeats)
    a = (pen @ t(final_w) + t(final_b)).reshape(B, N, N, mf, nf)
    block = a.permute(0, 1, 3, 2, 4).contiguous().reshape(B, N * mf, N * nf)
    h = t(afm).reshape(B, N * nf, 1)
    msg = torch.bmm(block, h).reshape(B, N, mf)
    return (msg + t(message_bias)).numpy()


def att_edge_network(head_ws, head_bs, shared_w, final_w, final_b,
                     attn_w, attn_b, afm, bfm, nf, mf, tail_repeats=50):
    """Per-pair messages: softmax-gated source features through the edge
    matrices (att_edge_network.py:13-31)."""
    B, N, _ = afm.shape
    pen = edge_mlp_penultimate(head_ws, head_bs, shared_w,
                               bfm.reshape(-1, bfm.shape[-1]), tail_repeats)
    a = (pen @ t(final_w) + t(final_b)).reshape(B, N, N, mf, nf)
    h = t(afm)
    cat = torch.cat([h.unsqueeze(-2).expand(-1, -1, N, -1), t(bfm)], dim=-1)
    aw = torch.softmax(cat @ t(attn_w) + t(attn_b), dim=-1)
    gated = (aw * h.unsqueeze(1)).unsqueeze(-1)          # (B,N,N,nf,1)
    return a.matmul(gated).squeeze(-1).numpy()


def bilinear_edge_network(afm, bfm, nf):
    """Literal matmul/reshape chain of bilinear_edge_network.py:26-38."""
    afm = t(afm)
    bfm = t(bfm)
    ees = bfm.shape[:3] + (nf, -1)
    return (afm.unsqueeze(1).unsqueeze(-2).matmul(bfm.reshape(ees))
            .reshape(ees).matmul(afm.unsqueeze(2).unsqueeze(-1))
            .squeeze().numpy())


def ggnn_fused(adj_w, message_bias, afm, bfm_types, nf, mf):
    """Per-edge-type weights, row 0 = zeros, fused block bmm
    (ggnn_msg_pass.py:17-31)."""
    B, N, _ = bfm_types.shape
    w = torch.cat([torch.zeros(1, mf, nf), t(adj_w)])
    a = w.index_select(0, t(bfm_types).reshape(-1).long())
    a = a.reshape(B, N, N, mf, nf).permute(0, 1, 3, 2, 4).contiguous()
    block = a.reshape(B, N * mf, N * nf)
    h = t(afm).reshape(B, N * nf, 1)
    return (torch.bmm(block, h).reshape(B, N, mf) + t(message_bias)).numpy()


def adj_agg(messages, adj):
    return (t(messages) * t(adj).unsqueeze(-1)).sum(dim=-2).numpy()


def wadj_agg(messages, adj):
    return (t(messages) * F.softmax(t(adj), dim=-1).unsqueeze(-1)) \
        .sum(dim=-2).numpy()


def att_agg(att_w, att_b, messages, adj):
    logits = t(adj).unsqueeze(-1) @ t(att_w) + t(att_b)
    w = F.softmax(logits, dim=-1)
    return (t(messages) * w).sum(dim=-2).numpy()


def gru_update(w_ih, w_hh, b_ih, b_hh, messages, node_states, mask):
    """Masked GRU (gru_update.py:26-35,55-68); weights given as (in, 3·out)."""
    B, N, nf = node_states.shape
    m = t(mask).reshape(-1, 1)
    x = t(messages).reshape(-1, nf)
    h = t(node_states).reshape(-1, nf)
    rzn_i = x @ t(w_ih) + t(b_ih)
    rzn_h = h @ t(w_hh) + t(b_hh)
    ri, zi, ni = torch.split(rzn_i, nf, dim=-1)
    rh, zh, nh = torch.split(rzn_h, nf, dim=-1)
    r = torch.sigmoid(ri + rh) * m
    z = torch.sigmoid(zi + zh) * m
    n = torch.tanh(ni + r * nh) * m
    out = ((1 - z) * n + z * h) * m
    return out.reshape(B, N, nf).numpy()


def mask_batch_norm(tensor, mask, eps=1e-6):
    """Stateless masked BN (mask_batch_norm.py:5-15): mean numerator sums all
    rows (padding included)."""
    x = t(tensor)
    orig = x.shape
    m = t(mask).reshape(-1, 1)
    x = x.reshape(-1, x.shape[-1])
    mean = x.sum(dim=0) / m.sum()
    var = ((x - mean) * m).pow(2).sum(dim=0) / m.sum()
    return ((((x - mean) * m) / (var + eps).sqrt()).reshape(orig)).numpy()


def bn1d(weight, bias, running_mean, running_var, tensor, mask,
         training, momentum=0.1, eps=1e-5):
    """MaskBatchNorm1d (mask_batch_norm.py:18-38). Returns
    (out, new_running_mean, new_running_var)."""
    x = t(tensor)
    orig = x.shape
    m = t(mask).reshape(-1, 1)
    y = x.reshape(-1, x.shape[-1])
    mean = (y * m).sum(dim=0) / m.sum()
    var = ((y - mean) * m).pow(2).sum(dim=0) / m.sum()
    rm, rv = t(running_mean).clone(), t(running_var).clone()
    if training:
        rm = (1 - momentum) * rm + momentum * mean
        rv = (1 - momentum) * rv + momentum * var
        y = (y - mean) / (var.sqrt() + eps)
    else:
        y = (y - rm) / (rv ** 0.5 + eps)
    y = t(weight) * y + t(bias)
    return ((y * m).reshape(orig)).numpy(), rm.numpy(), rv.numpy()


def graph_level_output(i_w, i_b, j_w, j_b, input_set, mask):
    """Gated masked sum with softmax-over-features gate
    (graph_level_output.py:30-47)."""
    x = t(input_set) * t(mask)
    gated = torch.softmax(x @ t(i_w) + t(i_b), dim=-1) \
        * (x @ t(j_w) + t(j_b)) * t(mask)
    return gated.sum(dim=1).numpy()


def set2vec(params, input_set, mask, time_steps=100, batch_softmax=True):
    """Set2Vec with input-less LSTM (set2vec.py:13-151). `params` is the same
    dict produced by set2vec_init (numpy arrays)."""
    x = t(input_set)
    B, N, W = x.shape
    p = {k: t(v) for k, v in params["lstm"].items()}
    q_w = t(params["q_attn"]["w"])
    e_w = t(params["e_attn"]["w"])
    mprev = torch.zeros(B, 2 * W)
    cprev = torch.zeros(B, W)
    add_mask = (1 - t(mask).reshape(B, N)) * -1e8
    for _ in range(time_steps):
        i = torch.sigmoid(mprev @ p["w_hi"] + p["b_hi"])
        f = torch.sigmoid(mprev @ p["w_hf"] + p["b_hf"])
        g = torch.tanh(mprev @ p["w_hg"] + p["b_hg"])
        o = torch.sigmoid(mprev @ p["w_ho"] + p["b_ho"])
        c = f * cprev + i * g
        m = o * torch.tanh(c)
        query = (m @ q_w).unsqueeze(1)
        energies = (torch.tanh(query + x).reshape(-1, W) @ e_w)  # (B·N, 1)
        energies = energies + add_mask.reshape(-1, 1)
        if batch_softmax:
            att = F.softmax(energies, dim=0).reshape(B, N, 1)
        else:
            att = F.softmax(energies.reshape(B, N), dim=-1).unsqueeze(-1)
        read = (att * x).sum(dim=1)
        mprev = torch.cat([m, read], dim=1)
        cprev = c
    return mprev.numpy()
