"""Composition-level lockstep parity for the QUIRKY families (round-5,
VERDICT item 5): transplanted-weights forward-identical + first-steps-loss
tracking vs a differentiable torch restatement of the full reference
composition, for

  * adv / att   — batch-GLOBAL set2vec softmax (set2vec.py:139), att
                  aggregation's softmax-over-singleton quirk
                  (attention_message_agg.py), GRU hidden = initial state
                  (models/models.py:122);
  * encoded     — frozen AEs + input BNs + PER-STEP message weights and
                  per-step bn1d EMAs (normed_encoded_basic_model.py:34-40);
  * encoded_ecfp — + output BN, sigmoid-MSE mask loss
                  (test_graph_encode_norm_ecfp.py:137).

The torch side is built here from the SAME parameter arrays (our init
transplanted leaf-by-leaf into torch.nn.Parameters), so both frameworks
start bit-identical and train in lockstep on the same batches with Adam.
The op-level math restates tests/torch_oracle.py's documented semantics in
differentiable form (the oracle functions return numpy and cannot train).

Unlike the lipo lockstep (test_parity_lockstep.py, torch→jax transplant),
these transplant jax→torch: the direction is irrelevant to the parity
claim — both sides run the same weights."""

import dataclasses
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, ".")


# ---------------------------------------------------------------------------
# jax params -> torch Parameters (same tree shape)
# ---------------------------------------------------------------------------

def _to_torch(tree):
    import torch
    if isinstance(tree, dict):
        return {k: _to_torch(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_to_torch(v) for v in tree]
    return torch.nn.Parameter(
        torch.from_numpy(np.array(tree, dtype=np.float32)))


def _torch_leaves(tree):
    import torch
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _torch_leaves(v)
    elif isinstance(tree, (list, tuple)):
        for v in tree:
            yield from _torch_leaves(v)
    elif isinstance(tree, torch.nn.Parameter):
        yield tree


def _to_plain(tree):
    """state trees: plain tensors (EMAs are assigned, not trained)."""
    import torch
    if isinstance(tree, dict):
        return {k: _to_plain(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_to_plain(v) for v in tree]
    return torch.from_numpy(np.array(tree, dtype=np.float32))


# ---------------------------------------------------------------------------
# differentiable torch restatement of the dense composition
# (op semantics per tests/torch_oracle.py; same reference file:line cites)
# ---------------------------------------------------------------------------

def _t_lin(p, x):
    y = x @ p["w"]
    return y + p["b"] if "b" in p else y


def _t_pen(mp, e, tail):
    import torch
    x = e
    for layer in mp["head"]:
        x = torch.relu(_t_lin(layer, x))
    for _ in range(tail):
        x = torch.relu(x @ mp["shared"]["w"])
    return x


def _t_edge_network_fused(mp, pen, h, nf, mf):
    import torch
    B, N = h.shape[:2]
    a = _t_lin(mp["final"], pen).reshape(B, N, N, mf, nf)
    block = a.permute(0, 1, 3, 2, 4).reshape(B, N * mf, N * nf)
    msg = torch.bmm(block, h.reshape(B, N * nf, 1)).reshape(B, N, mf)
    return msg + mp["message_bias"]


def _t_att_edge_network(mp, pen, h, bfm, nf, mf):
    import torch
    B, N = h.shape[:2]
    a = _t_lin(mp["final"], pen).reshape(B, N, N, mf, nf)
    cat = torch.cat([h.unsqueeze(-2).expand(-1, -1, N, -1), bfm], dim=-1)
    aw = torch.softmax(_t_lin(mp["attn"], cat), dim=-1)
    gated = (aw * h.unsqueeze(1)).unsqueeze(-1)
    return a.matmul(gated).squeeze(-1)


def _t_att_agg(aggp, messages, adj):
    import torch
    logits = adj.unsqueeze(-1) @ aggp["att"]["w"] + aggp["att"]["b"]
    w = torch.softmax(logits, dim=-1)     # singleton axis -> 1.0 (quirk)
    return (messages * w).sum(dim=-2)


def _t_gru(gp, messages, h, mask):
    import torch
    nf = h.shape[-1]
    rzn_i = messages @ gp["w_ih"] + gp["b_ih"]
    rzn_h = h @ gp["w_hh"] + gp["b_hh"]
    ri, zi, ni = torch.split(rzn_i, nf, dim=-1)
    rh, zh, nh = torch.split(rzn_h, nf, dim=-1)
    r = torch.sigmoid(ri + rh) * mask
    z = torch.sigmoid(zi + zh) * mask
    n = torch.tanh(ni + r * nh) * mask
    return ((1 - z) * n + z * h) * mask


def _t_bn1d(p, s, x, mask, training, momentum=0.1, eps=1e-5):
    import torch
    orig = x.shape
    f = orig[-1]
    y = x.reshape(-1, f)
    m = mask.reshape(-1, 1)
    mean = (y * m).sum(dim=0) / m.sum()
    var = (((y - mean) * m) ** 2).sum(dim=0) / m.sum()
    if training:
        ns = {"running_mean": (1 - momentum) * s["running_mean"]
              + momentum * mean.detach(),
              "running_var": (1 - momentum) * s["running_var"]
              + momentum * var.detach()}
        y = (y - mean) / (torch.sqrt(torch.clamp(var, min=1e-12)) + eps)
    else:
        ns = s
        y = (y - s["running_mean"]) / (s["running_var"] ** 0.5 + eps)
    y = p["weight"] * y + p["bias"]
    return (y * m).reshape(orig), ns


def _t_mask_bn(x, mask, eps=1e-6):
    orig = x.shape
    y = x.reshape(-1, x.shape[-1])
    m = mask.reshape(-1, 1)
    mean = y.sum(dim=0) / m.sum()       # reference quirk: pad rows counted
    var = (((y - mean) * m) ** 2).sum(dim=0) / m.sum()
    return ((y - mean) * m / (var + eps) ** 0.5).reshape(orig)


def _t_tanh_encoder(p, x):
    import torch
    return _t_lin(p["enc"][1], torch.tanh(_t_lin(p["enc"][0], x)))


def _t_graph_level(p, x, mask):
    import torch
    x = x * mask
    gated = torch.softmax(_t_lin(p["i"], x), dim=-1) * _t_lin(p["j"], x) \
        * mask
    return gated.sum(dim=1)


def _t_set2vec(p, x, mask, time_steps, batch_softmax=True):
    import torch
    import torch.nn.functional as F
    B, N, W = x.shape
    lp = p["lstm"]
    mprev = torch.zeros(B, 2 * W)
    cprev = torch.zeros(B, W)
    add_mask = (1 - mask.reshape(B, N)) * -1e8
    for _ in range(time_steps):
        i = torch.sigmoid(mprev @ lp["w_hi"] + lp["b_hi"])
        f = torch.sigmoid(mprev @ lp["w_hf"] + lp["b_hf"])
        g = torch.tanh(mprev @ lp["w_hg"] + lp["b_hg"])
        o = torch.sigmoid(mprev @ lp["w_ho"] + lp["b_ho"])
        c = f * cprev + i * g
        m = o * torch.tanh(c)
        query = (m @ p["q_attn"]["w"]).unsqueeze(1)
        en = (torch.tanh(query + x).reshape(-1, W) @ p["e_attn"]["w"])
        en = en + add_mask.reshape(-1, 1)
        if batch_softmax:
            att = F.softmax(en, dim=0).reshape(B, N, 1)
        else:
            att = F.softmax(en.reshape(B, N), dim=-1).unsqueeze(-1)
        read = (att * x).sum(dim=1)
        mprev = torch.cat([m, read], dim=1)
        cprev = c
    return mprev


def torch_network_forward(tp, ts, cfg, afm, bfm, adj, mask,
                          training=True):
    """Differentiable torch mirror of network_apply (plain wrapper +
    mpnn_apply + linear head) for the three tested families. Returns
    (out, new_state)."""
    mcfg = cfg.mpnn
    mp = tp["mpnn"]
    ms = ts["mpnn"]
    new_ms = dict(ms)
    afm = afm * mask
    bfm = bfm * adj.unsqueeze(-1)
    if mcfg.atom_encoder == "atom_ae":
        afm = _t_tanh_encoder(mp["atom_encoder"], afm)
    if mcfg.bond_encoder == "bond_ae":
        bfm = _t_tanh_encoder(mp["bond_encoder"], bfm)
    if mcfg.input_norm:
        afm, new_ms["aebn"] = _t_bn1d(mp["aebn"], ms["aebn"], afm, mask,
                                      training)
        bfm, new_ms["bebn"] = _t_bn1d(mp["bebn"], ms["bebn"], bfm, adj,
                                      training)
    pens = [_t_pen(m, bfm, mcfg.edge_mlp_tail_repeats)
            for m in mp["message"]]
    ma_s = list(ms.get("ma_bn", []))
    bn_s = list(ms.get("bn", []))
    h = afm
    nf, mf = mcfg.node_features, mcfg.message_features
    for step in range(mcfg.message_steps):
        mi = 0 if mcfg.share_message_weights else step
        ni = step if mcfg.per_step_norms else 0
        src = afm if mcfg.message_input == "initial" else h
        if mcfg.message_fn == "edge_network":
            msgs = _t_edge_network_fused(mp["message"][mi], pens[mi], src,
                                         nf, mf)
        else:
            per_pair = _t_att_edge_network(mp["message"][mi], pens[mi],
                                           src, bfm, nf, mf)
            if mcfg.aggregation == "att":
                msgs = _t_att_agg(mp["agg"], per_pair, adj)
            else:
                msgs = (per_pair * adj.unsqueeze(-1)).sum(dim=-2)
        if mcfg.msg_norm == "bn1d":
            msgs, ma_s[ni] = _t_bn1d(mp["ma_bn"][ni], ma_s[ni], msgs,
                                     mask, training)
        hidden = h if mcfg.update_hidden == "state" else afm
        h = _t_gru(mp["gru"], msgs, hidden, mask)
        if mcfg.state_norm == "stateless":
            h = _t_mask_bn(h, mask)
        elif mcfg.state_norm == "bn1d":
            h, bn_s[ni] = _t_bn1d(mp["bn"][ni], bn_s[ni], h, mask,
                                  training)
    if ma_s:
        new_ms["ma_bn"] = ma_s
    if bn_s:
        new_ms["bn"] = bn_s
    import torch
    ro_in = torch.cat([h, afm], dim=-1)
    if mcfg.readout == "graph_level":
        out = _t_graph_level(mp["readout"], ro_in, mask)
    else:
        out = _t_set2vec(mp["readout"], ro_in, mask,
                         time_steps=mcfg.set2vec_steps,
                         batch_softmax=mcfg.set2vec_batch_softmax)
    if mcfg.output_norm:
        ones = torch.ones(out.shape[0], 1)
        out, new_ms["obn"] = _t_bn1d(mp["obn"], ms["obn"], out, ones,
                                     training)
    new_ts = dict(ts)
    new_ts["mpnn"] = new_ms
    out = _t_lin(tp["head"][0], out)
    return out, new_ts


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------

def _dataset(n=32, seed=7):
    from mpnn_tpu import graphs as G
    smiles = ["CCO", "c1ccccc1", "CC(=O)O",
              "CC(C)Cc1ccc(cc1)C(C)C(=O)O", "C1CCCCC1",
              "CN1C=NC2=C1C(=O)N(C(=O)N2C)C", "NC(=O)c1ccccc1",
              "OC(=O)c1ccccc1O", "CCN(CC)CC", "CC(C)O"]
    smiles = (smiles * ((n + len(smiles) - 1) // len(smiles)))[:n]
    gs = G.generate_molgraphs(smiles, [0.1 * len(s) for s in smiles])
    gs, ge = G.encode_molgraphs(gs)
    return gs, ge


def _dense(graphs, ncap):
    import torch
    from mpnn_tpu import graphs as G
    b = G.collate_dense(graphs, num_nodes=ncap)
    tb = (torch.from_numpy(np.asarray(b["afm"], np.float32)),
          torch.from_numpy(np.asarray(b["bfm"], np.float32)),
          torch.from_numpy(np.asarray(b["adj"], np.float32)),
          torch.from_numpy(np.asarray(b["mask"], np.float32)))
    return b, tb


def _lockstep(cfg, gs, loss_kind, *, steps=4, lr=1e-3, nbits=0,
              fwd_atol=5e-5, loss_rtol=0.02):
    """Shared harness: transplant → forward-identical → N lockstep Adam
    steps with tracking losses."""
    import torch
    import jax
    import jax.numpy as jnp
    import optax
    from mpnn_tpu.models import network_init, network_apply
    from mpnn_tpu.train.optim import adam

    params, state = network_init(jax.random.PRNGKey(3), cfg)
    tp = _to_torch(params)
    ts = _to_plain(state)
    ncap = int(-(-max(g.num_atoms for g in gs) // 8) * 8)
    rng = np.random.RandomState(5)
    if nbits:
        bits = (rng.rand(len(gs), ncap, nbits) < 0.05).astype(np.float32)

    def labels_for(idx):
        if nbits:
            return bits[idx]
        if loss_kind == "ce":
            return np.asarray([gs[i].num_atoms % 4 for i in idx], np.int64)
        return np.asarray([gs[i].label for i in idx], np.float32)

    # --- forward-identical on the first batch
    idx0 = list(range(16))
    b0, (tafm, tbfm, tadj, tmask) = _dense([gs[i] for i in idx0], ncap)
    with torch.no_grad():
        t_out, _ = torch_network_forward(tp, ts, cfg, tafm, tbfm, tadj,
                                         tmask, training=True)
    jb0 = {k: jnp.asarray(v) for k, v in b0.items()}
    j_out, _ = network_apply(params, state, cfg, jb0, training=True)
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                               atol=fwd_atol)

    # --- lockstep training
    topt = torch.optim.Adam(list(_torch_leaves(tp)), lr=lr)
    tx = adam(lr)
    ost = tx.init(params)

    def jax_loss(out, y, jb):
        if nbits:
            pred = jax.nn.sigmoid(out[:, None, :] * jb["mask"])
            return ((pred - y) ** 2).mean()
        if loss_kind == "ce":
            return optax.softmax_cross_entropy_with_integer_labels(
                out, y).mean()
        return ((out - y[:, None]) ** 2).mean()

    @jax.jit
    def step(p, s, o, jb, y):
        def lf(p, s):
            out, ns = network_apply(p, s, cfg, jb, training=True)
            return jax_loss(out, y, jb), ns
        (l, ns), g = jax.value_and_grad(lf, has_aux=True)(p, s)
        u, o_ = tx.update(g, o, p)
        return l, optax.apply_updates(p, u), ns, o_

    tls, jls = [], []
    for it in range(steps):
        idx = [(it * 16 + j) % len(gs) for j in range(16)]
        y = labels_for(idx)
        bt, (tafm, tbfm, tadj, tmask) = _dense([gs[i] for i in idx], ncap)
        topt.zero_grad()
        t_out, ts = torch_network_forward(tp, ts, cfg, tafm, tbfm, tadj,
                                          tmask, training=True)
        if nbits:
            pred = torch.sigmoid(t_out.unsqueeze(1) * tmask)
            tl = ((pred - torch.from_numpy(y)) ** 2).mean()
        elif loss_kind == "ce":
            tl = torch.nn.functional.cross_entropy(
                t_out, torch.from_numpy(y))
        else:
            tl = ((t_out - torch.from_numpy(y)[:, None]) ** 2).mean()
        tl.backward()
        topt.step()
        jb = {k: jnp.asarray(v) for k, v in bt.items()}
        yj = jnp.asarray(y)
        jl, params, state, ost = step(params, state, ost, jb, yj)
        tls.append(float(tl.detach()))
        jls.append(float(jl))
    np.testing.assert_allclose(jls, tls, rtol=loss_rtol)
    return jls, tls


class TestAdvLockstep:
    def test_att_set2vec_lockstep(self):
        """adv composition (AttEdgeNetwork + att agg + BATCH-GLOBAL
        set2vec + GRU hidden=initial), CE loss — the reference test_adv
        driver shape at small T/tail."""
        from mpnn_tpu.models import build
        gs, ge = _dataset()
        cfg = build("adv", afm=ge.atom_width(), bfm=ge.bond_width(),
                    n_out=4)
        cfg = dataclasses.replace(cfg, mpnn=dataclasses.replace(
            cfg.mpnn, edge_mlp_tail_repeats=3, message_steps=2,
            set2vec_steps=4))
        _lockstep(cfg, gs, "ce")


class TestEncodedLockstep:
    def test_encoded_per_step_bn_lockstep(self):
        """encoded composition (frozen-AE inputs + input BNs + per-step
        message weights + per-step bn1d EMA pairs), MSE loss — the
        affinity-driver shape."""
        from mpnn_tpu.models import build
        gs, ge = _dataset()
        cfg = build("encoded", afm=ge.atom_width(), bfm=ge.bond_width(),
                    n_out=1)
        cfg = dataclasses.replace(cfg, mpnn=dataclasses.replace(
            cfg.mpnn, edge_mlp_tail_repeats=3, message_steps=2))
        _lockstep(cfg, gs, "mse")


class TestEcfpLockstep:
    def test_ecfp_sigmoid_mse_lockstep(self):
        """encoded_ecfp composition (+ output BN) with the reference
        sigmoid-MSE mask loss (MSE(sigmoid(out·mask), bits),
        test_graph_encode_norm_ecfp.py:137) at a narrow bit width."""
        from mpnn_tpu.models import build
        gs, ge = _dataset()
        cfg = build("encoded_ecfp", afm=ge.atom_width(),
                    bfm=ge.bond_width(), n_out=64)
        cfg = dataclasses.replace(cfg, mpnn=dataclasses.replace(
            cfg.mpnn, edge_mlp_tail_repeats=3, message_steps=2))
        _lockstep(cfg, gs, "ecfp", nbits=64)
