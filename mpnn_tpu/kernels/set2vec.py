"""Pallas TPU fused SET2VEC readout kernel.

The att-family probe (round 3) attributed 3.9 ms of the 4.4 ms fused att
step to the XLA set2vec scan — 12 iterations of {tiny LSTM matmuls, a
per-node gather, a global softmax, a segment-sum scatter} on (N, 2nf)
tensors is pure small-op/scatter launch latency, dwarfing the 0.38 ms
message+GRU kernel. This kernel runs the ENTIRE T-step set2set loop
(Vinyals et al.; reference mpnn_functions/readout/set2vec.py:84-151,
'default' inner product, BATCH-GLOBAL softmax — the reference's dim-0
quirk, set2vec.py:139) in ONE forward and ONE backward pallas_call.

Semantics (sparse_set2vec, models/sparse.py):
    m_0 = 0 (G, 2w), c_0 = 0 (G, w), w = 2·nf, x = cat([h_T, h_0])
    for t in 1..T:
        h_t, c_t = LSTMhidden(m_{t-1}, c_{t-1})       (no input; 2w → w)
        q_t      = h_t · Wq                            (w → w, no bias)
        e_v      = we · tanh(q_{g(v)} + x_v) − 1e9·(1−mask_v)
        att      = softmax over ALL nodes (batch-global)
        read_g   = Σ_{v∈g} att_v · x_v
        m_t      = [h_t ‖ read]
    return m_T (G, 2w)

Layout: transposed panels. The m carry is kept as TWO (wp, gp) panels
(mh = the LSTM h half, mr = the read half) so the 2w-row LSTM input never
needs an unaligned row concat — the LSTM weights are pre-split into
top/bottom (w, w) blocks. Per-graph segment ops ride the same
128-graph-block membership one-hots as kernels/fused_step.py (fs_ns).

Residuals: the per-step carries (mh, mr, c; (T+1)·3 tiny panels) and att
rows — everything else is recomputed in the backward walk.

Parity: tests/test_fused_att.py::TestSet2VecKernel vs sparse_set2vec.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpnn_tpu.kernels.fused_step import (_graph_onehot, _round_up,
                                         GRAPH_BLOCK)
from mpnn_tpu.kernels.recurrence import _dot

_BIG_NEG = -1e8      # the reference's set2vec masking constant


def _lstm_fwd(mh, mr, c, wt, wb, bs):
    """One LSTMhidden step on transposed panels. wt/wb: dicts of the
    top/bottom (wp, wp) weight blocks (already transposed so
    gate = W^T·mprev is _dot(w, panel)); bs: (wp, 1) bias cols."""
    ai = _dot(wt["i"], mh) + _dot(wb["i"], mr) + bs["i"]
    af = _dot(wt["f"], mh) + _dot(wb["f"], mr) + bs["f"]
    ag = _dot(wt["g"], mh) + _dot(wb["g"], mr) + bs["g"]
    ao = _dot(wt["o"], mh) + _dot(wb["o"], mr) + bs["o"]
    i = jax.nn.sigmoid(ai)
    f = jax.nn.sigmoid(af)
    g = jnp.tanh(ag)
    o = jax.nn.sigmoid(ao)
    c_new = f * c + i * g
    h = o * jnp.tanh(c_new)
    return h, c_new, (i, f, g, o)


def _s2v_fwd_kernel(ns_ref, x_ref, amask_ref, ng_ref,
                    wti_ref, wtf_ref, wtg_ref, wto_ref,
                    wbi_ref, wbf_ref, wbg_ref, wbo_ref,
                    bi_ref, bf_ref, bg_ref, bo_ref,
                    wqt_ref, we_ref,
                    mh_out, mr_out, mhs_out, mrs_out, cs_out, att_out,
                    e_s, mr_s,
                    *, steps: int, w: int, wp: int, nw: int, gb: int,
                    npad: int, batch_softmax: bool = True):
    dt = jnp.float32
    gw = GRAPH_BLOCK
    wt = {"i": wti_ref[:], "f": wtf_ref[:], "g": wtg_ref[:],
          "o": wto_ref[:]}
    wb = {"i": wbi_ref[:], "f": wbf_ref[:], "g": wbg_ref[:],
          "o": wbo_ref[:]}
    bs = {"i": bi_ref[:], "f": bf_ref[:], "g": bg_ref[:], "o": bo_ref[:]}
    amask = amask_ref[:]                   # (1, npad): −1e8 at pad nodes
    mh = jnp.zeros_like(mh_out[:])
    mr = jnp.zeros_like(mh)
    c = jnp.zeros_like(mh)
    mhs_out[0:wp, :] = mh
    mrs_out[0:wp, :] = mr
    cs_out[0:wp, :] = c
    for t in range(1, steps + 1):
        h, c, _gates = _lstm_fwd(mh, mr, c, wt, wb, bs)
        q = _dot(wqt_ref[:], h)                            # (wp, gp)
        # energies row, block by block (q broadcast via membership
        # one-hot). Consecutive blocks' node windows may overlap; `own`
        # (1 exactly at this block's nodes) makes each lane written by
        # its own block only, so the += across overlaps is exact.
        e_s[:] = jnp.zeros_like(e_s)
        for j in range(gb):
            ns = pl.multiple_of(ns_ref[j], 128)
            og = _graph_onehot(ng_ref, ns, j, nw=nw, dtype=dt)
            qb = _dot(q[:, j * gw:(j + 1) * gw], og.T)     # (wp, nw)
            th = jnp.tanh(qb + x_ref[:, pl.ds(ns, nw)])
            eb = _dot(we_ref[:].T, th)                     # (1, nw)
            own = jnp.sum(og, axis=1, keepdims=True).T     # (1, nw)
            e_s[0:1, pl.ds(ns, nw)] += eb * own
        if batch_softmax:
            e = e_s[0:1, :] + amask
            att = jnp.exp(e - jnp.max(e))                  # global softmax
            att = att / jnp.sum(att)
            att_out[t - 1:t, :] = att
            e_s[0:1, :] = att      # park att so blocks can ref-slice it
        else:
            # PER-GRAPH softmax: each graph lives wholly inside one
            # 128-graph block's node window, so max/exp/denom/normalize
            # all complete block-locally in ONE pass (more local than the
            # batch-global quirk). Non-own lanes (window overlap, pad
            # nodes outside every block) are pinned to −1e8 pre-exp so
            # exp() underflows to exact 0 — no inf·0 hazards.
            e_s[1:2, :] = e_s[0:1, :] + amask
            e_s[0:1, :] = jnp.zeros_like(e_s[0:1, :])
            for j in range(gb):
                ns = pl.multiple_of(ns_ref[j], 128)
                og = _graph_onehot(ng_ref, ns, j, nw=nw, dtype=dt)
                own = jnp.sum(og, axis=1, keepdims=True).T    # (1, nw)
                eb = e_s[1:2, pl.ds(ns, nw)] * own \
                    + (1.0 - own) * _BIG_NEG
                mx = jnp.max(og * eb.T + (1.0 - og) * _BIG_NEG,
                             axis=0, keepdims=True)           # (1, gw)
                zb = jnp.exp(eb - _dot(mx, og.T)) * own
                den = _dot(zb, og)                            # (1, gw)
                attb = zb / (_dot(den, og.T) + (1.0 - own))
                e_s[0:1, pl.ds(ns, nw)] += attb * own
            att_out[t - 1:t, :] = e_s[0:1, :]
        for j in range(gb):
            ns = pl.multiple_of(ns_ref[j], 128)
            og = _graph_onehot(ng_ref, ns, j, nw=nw, dtype=dt)
            xb = x_ref[:, pl.ds(ns, nw)]
            ab = e_s[0:1, pl.ds(ns, nw)]
            mr_s[:, j * gw:(j + 1) * gw] = _dot(xb * ab, og)
        mh = h
        mr = mr_s[:]
        mhs_out[t * wp:(t + 1) * wp, :] = mh
        mrs_out[t * wp:(t + 1) * wp, :] = mr
        cs_out[t * wp:(t + 1) * wp, :] = c
    mh_out[:] = mh
    mr_out[:] = mr


def _s2v_bwd_kernel(ns_ref, x_ref, amask_ref, ng_ref,
                    wti_ref, wtf_ref, wtg_ref, wto_ref,
                    wbi_ref, wbf_ref, wbg_ref, wbo_ref,
                    bi_ref, bf_ref, bg_ref, bo_ref,
                    wqt_ref, we_ref,
                    mhs_ref, mrs_ref, cs_ref, att_ref,
                    gmh_ref, gmr_ref,
                    dx_out,
                    dwti_out, dwtf_out, dwtg_out, dwto_out,
                    dwbi_out, dwbf_out, dwbg_out, dwbo_out,
                    dbi_out, dbf_out, dbg_out, dbo_out,
                    dwqt_out, dwe_out,
                    datt_s, dq_s,
                    *, steps: int, w: int, wp: int, nw: int, gb: int,
                    npad: int, batch_softmax: bool = True):
    dt = jnp.float32
    gw = GRAPH_BLOCK
    wt = {"i": wti_ref[:], "f": wtf_ref[:], "g": wtg_ref[:],
          "o": wto_ref[:]}
    wb = {"i": wbi_ref[:], "f": wbf_ref[:], "g": wbg_ref[:],
          "o": wbo_ref[:]}
    bs = {"i": bi_ref[:], "f": bf_ref[:], "g": bg_ref[:], "o": bo_ref[:]}
    dx_out[:] = jnp.zeros_like(dx_out)
    dwti = dwtf = dwtg = dwto = jnp.zeros_like(wt["i"])
    dwbi = dwbf = dwbg = dwbo = jnp.zeros_like(wt["i"])
    dbi = dbf = dbg = dbo = jnp.zeros((wp, 1), dt)
    dwqt = jnp.zeros_like(wqt_ref[:])
    dwe = jnp.zeros_like(we_ref[:])
    dmh = gmh_ref[:]
    dmr = gmr_ref[:]
    dc = jnp.zeros_like(dmh)
    for t in range(steps, 0, -1):
        mh_p = mhs_ref[(t - 1) * wp:t * wp, :]
        mr_p = mrs_ref[(t - 1) * wp:t * wp, :]
        c_p = cs_ref[(t - 1) * wp:t * wp, :]
        h, c_t, (i, f, g, o) = _lstm_fwd(mh_p, mr_p, c_p, wt, wb, bs)
        att = att_ref[t - 1:t, :]
        q = _dot(wqt_ref[:], h)

        # --- read backward: dread = dmr; datt; dx; de via global softmax
        datt_s[:] = jnp.zeros_like(datt_s)
        datt_s[1:2, :] = att       # park att so blocks can ref-slice it
        for j in range(gb):
            ns = pl.multiple_of(ns_ref[j], 128)
            og = _graph_onehot(ng_ref, ns, j, nw=nw, dtype=dt)
            own = jnp.sum(og, axis=1, keepdims=True).T     # (1, nw)
            xb = x_ref[:, pl.ds(ns, nw)]
            ab = datt_s[1:2, pl.ds(ns, nw)]
            drb = _dot(dmr[:, j * gw:(j + 1) * gw], og.T)  # (wp, nw)
            dx_out[:, pl.ds(ns, nw)] += ab * drb * own
            dab = jnp.sum(drb * xb, axis=0, keepdims=True) * own
            datt_s[0:1, pl.ds(ns, nw)] += dab
        datt = datt_s[0:1, :]
        if batch_softmax:
            de = att * (datt - jnp.sum(datt * att))        # global softmax
            datt_s[0:1, :] = de    # park de so blocks can ref-slice it
        else:
            # per-graph softmax backward: de_v = att_v·(datt_v − s_g(v)),
            # s_g = Σ_{v∈g} datt_v·att_v — one block-local pass
            datt_s[2:3, :] = datt * att
            datt_s[3:4, :] = datt
            datt_s[0:1, :] = jnp.zeros_like(datt)
            for j in range(gb):
                ns = pl.multiple_of(ns_ref[j], 128)
                og = _graph_onehot(ng_ref, ns, j, nw=nw, dtype=dt)
                own = jnp.sum(og, axis=1, keepdims=True).T
                sg = _dot(datt_s[2:3, pl.ds(ns, nw)] * own, og)  # (1, gw)
                ab = datt_s[1:2, pl.ds(ns, nw)]
                deb = ab * (datt_s[3:4, pl.ds(ns, nw)]
                            - _dot(sg, og.T))
                datt_s[0:1, pl.ds(ns, nw)] += deb * own
        # --- energies backward: e = we^T tanh(q_bcast + x)
        for j in range(gb):
            ns = pl.multiple_of(ns_ref[j], 128)
            og = _graph_onehot(ng_ref, ns, j, nw=nw, dtype=dt)
            own = jnp.sum(og, axis=1, keepdims=True).T
            qb = _dot(q[:, j * gw:(j + 1) * gw], og.T)
            th = jnp.tanh(qb + x_ref[:, pl.ds(ns, nw)])
            deb = datt_s[0:1, pl.ds(ns, nw)] * own
            dwe += jnp.sum(th * deb, axis=1, keepdims=True)
            dth = we_ref[:] * deb * (1.0 - th * th)        # (wp, nw)
            dx_out[:, pl.ds(ns, nw)] += dth * own
            dq_s[:, j * gw:(j + 1) * gw] = _dot(dth, og)
        # --- q = wqt·h
        dq = dq_s[:]
        dwqt += _dot(dq, h.T)
        dh = dmh + _dot(wqt_ref[:].T, dq)
        # --- LSTM backward
        tc = jnp.tanh(c_t)
        do = dh * tc
        dct = dc + dh * o * (1.0 - tc * tc)
        df = dct * c_p
        dc = dct * f
        di = dct * g
        dg = dct * i
        dai = di * i * (1.0 - i)
        daf = df * f * (1.0 - f)
        dag = dg * (1.0 - g * g)
        dao = do * o * (1.0 - o)
        dwti += _dot(dai, mh_p.T)
        dwtf += _dot(daf, mh_p.T)
        dwtg += _dot(dag, mh_p.T)
        dwto += _dot(dao, mh_p.T)
        dwbi += _dot(dai, mr_p.T)
        dwbf += _dot(daf, mr_p.T)
        dwbg += _dot(dag, mr_p.T)
        dwbo += _dot(dao, mr_p.T)
        dbi += jnp.sum(dai, axis=1, keepdims=True)
        dbf += jnp.sum(daf, axis=1, keepdims=True)
        dbg += jnp.sum(dag, axis=1, keepdims=True)
        dbo += jnp.sum(dao, axis=1, keepdims=True)
        dmh = _dot(wt["i"].T, dai) + _dot(wt["f"].T, daf) \
            + _dot(wt["g"].T, dag) + _dot(wt["o"].T, dao)
        dmr = _dot(wb["i"].T, dai) + _dot(wb["f"].T, daf) \
            + _dot(wb["g"].T, dag) + _dot(wb["o"].T, dao)
    dwti_out[:] = dwti
    dwtf_out[:] = dwtf
    dwtg_out[:] = dwtg
    dwto_out[:] = dwto
    dwbi_out[:] = dwbi
    dwbf_out[:] = dwbf
    dwbg_out[:] = dwbg
    dwbo_out[:] = dwbo
    dbi_out[:] = dbi
    dbf_out[:] = dbf
    dbg_out[:] = dbg
    dbo_out[:] = dbo
    dwqt_out[:] = dwqt
    dwe_out[:] = dwe


def _s2v_vmem(wp: int, npad: int, gp: int, steps: int, n_node_panels: int):
    """VMEM-limit estimate: (wp, npad) node panels + the (steps+1)·3 tiny
    (wp, gp) carry stashes (counted twice — the compiler keeps operand and
    result copies live) + the att stash. Measured on hardware at batch
    1024 (npad=13184, gp=1024, T=12): the compiler's stack need was
    18.65 MB fwd / 28.88 MB bwd — the panel counts below bound both with
    ~25% headroom."""
    est = (n_node_panels * wp * npad + 6 * (steps + 1) * wp * gp
           + 2 * (steps + 8) * npad) * 4 + 4 * 2 ** 20
    if est <= 15 * 2 ** 20:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=min(110 * 2 ** 20, est))


def make_set2vec_op(w: int, n: int, n_graphs: int, *, time_steps: int,
                    node_window: int = 2048, interpret: bool = False,
                    batch_softmax: bool = True):
    """Fused set2vec readout op.

    op(rparams {'lstm': {w_hi..b_ho}, 'q_attn': {w}, 'e_attn': {w}},
       x (N, w), mask (N, 1), node_graph (N,) int32, ns) -> m (G, 2w)

    Differentiable in rparams and x. batch_softmax=True is the reference
    quirk (softmax over ALL nodes in the batch, set2vec.py:139); False is
    the sane per-graph normalization — block-local in this kernel, since
    each graph lives wholly inside one 128-graph block's node window.
    'dot' energy mode stays on the XLA path."""
    npad = _round_up(n, 128)
    wp = _round_up(w, 16)
    gp = _round_up(max(n_graphs, 1), GRAPH_BLOCK)
    gb = gp // GRAPH_BLOCK
    nw = min(node_window, npad)
    tp = _round_up(time_steps, 8)
    dt = jnp.float32

    def _vm():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    def pack(rparams, x, mask, node_graph):
        lstm = rparams["lstm"]

        def split(wm):     # (2w, w) -> top/bottom (wp, wp), pre-transposed
            wt = wm.astype(dt)
            top = jnp.pad(wt[:w].T, ((0, wp - w), (0, wp - w)))
            bot = jnp.pad(wt[w:].T, ((0, wp - w), (0, wp - w)))
            return top, bot

        wti, wbi = split(lstm["w_hi"])
        wtf, wbf = split(lstm["w_hf"])
        wtg, wbg = split(lstm["w_hg"])
        wto, wbo = split(lstm["w_ho"])

        def col(v):     # lstm biases are (1, w) (readout.py) -> (wp, 1)
            return jnp.pad(v.astype(dt).reshape(-1)[:, None],
                           ((0, wp - w), (0, 0)))

        wqt = jnp.pad(rparams["q_attn"]["w"].astype(dt).T,
                      ((0, wp - w), (0, wp - w)))
        we = jnp.pad(rparams["e_attn"]["w"].astype(dt),
                     ((0, wp - w), (0, 0)))           # (w,1) -> (wp,1)
        xt = jnp.pad(x.astype(dt), ((0, 0), (0, wp - w))).T
        if npad != n:
            xt = jnp.pad(xt, ((0, 0), (0, npad - n)))
        am = (1.0 - mask.astype(dt).reshape(1, n)) * _BIG_NEG
        amask = jnp.pad(am, ((0, 0), (0, npad - n)),
                        constant_values=_BIG_NEG)
        ng_row = jnp.pad(node_graph.astype(jnp.int32).reshape(1, n),
                         ((0, 0), (0, npad - n)),
                         constant_values=n_graphs)
        return (xt, amask, ng_row, wti, wtf, wtg, wto, wbi, wbf, wbg,
                wbo, col(lstm["b_hi"]), col(lstm["b_hf"]),
                col(lstm["b_hg"]), col(lstm["b_ho"]), wqt, we)

    def run_fwd(rparams, x, mask, node_graph, ns):
        packed = pack(rparams, x, mask, node_graph)
        kernel = functools.partial(
            _s2v_fwd_kernel, steps=time_steps, w=w, wp=wp, nw=nw, gb=gb,
            npad=npad, batch_softmax=batch_softmax)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[_vm()] * 17,
            out_specs=tuple([_vm()] * 6),
            scratch_shapes=[
                pltpu.VMEM((8, npad), dt),       # energies / att row
                pltpu.VMEM((wp, gp), dt),        # read accumulator
            ],
        )
        wg = jax.ShapeDtypeStruct((wp, gp), dt)
        stash = jax.ShapeDtypeStruct(((time_steps + 1) * wp, gp), dt)
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(wg, wg, stash, stash, stash,
                       jax.ShapeDtypeStruct((tp, npad), dt)),
            compiler_params=_s2v_vmem(wp, npad, gp, time_steps, 12),
            interpret=interpret,
        )(ns, *packed)

    def public(mh, mr, x):
        return jnp.concatenate(
            [mh[:w, :n_graphs].T, mr[:w, :n_graphs].T],
            axis=1).astype(x.dtype)

    @jax.custom_vjp
    def op(rparams, x, mask, node_graph, ns):
        mh, mr, _, _, _, _ = run_fwd(rparams, x, mask, node_graph, ns)
        return public(mh, mr, x)

    def fwd(rparams, x, mask, node_graph, ns):
        mh, mr, mhs, mrs, cs, att = run_fwd(rparams, x, mask, node_graph,
                                            ns)
        return public(mh, mr, x), (rparams, x, mask, node_graph, ns,
                                   mhs, mrs, cs, att)

    def bwd(res, gm):
        rparams, x, mask, node_graph, ns, mhs, mrs, cs, att = res
        packed = pack(rparams, x, mask, node_graph)
        gmh = jnp.pad(gm.astype(dt)[:, :w].T,
                      ((0, wp - w), (0, gp - n_graphs)))
        gmr = jnp.pad(gm.astype(dt)[:, w:].T,
                      ((0, wp - w), (0, gp - n_graphs)))
        kernel = functools.partial(
            _s2v_bwd_kernel, steps=time_steps, w=w, wp=wp, nw=nw, gb=gb,
            npad=npad, batch_softmax=batch_softmax)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[_vm()] * 23,
            out_specs=tuple([_vm()] * 15),
            scratch_shapes=[
                pltpu.VMEM((8, npad), dt),       # datt / parked att / de
                pltpu.VMEM((wp, gp), dt),        # dq accumulator
            ],
        )
        ww = jax.ShapeDtypeStruct((wp, wp), dt)
        wc = jax.ShapeDtypeStruct((wp, 1), dt)
        outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((wp, npad), dt),
                       ww, ww, ww, ww, ww, ww, ww, ww,
                       wc, wc, wc, wc, ww, wc),
            compiler_params=_s2v_vmem(wp, npad, gp, time_steps, 18),
            interpret=interpret,
        )(ns, *packed, mhs, mrs, cs, att, gmh, gmr)
        (dx_t, dwti, dwtf, dwtg, dwto, dwbi, dwbf, dwbg, dwbo,
         dbi, dbf, dbg, dbo, dwqt, dwe) = outs

        def join(top, bot):      # back to (2w, w)
            return jnp.concatenate([top[:w, :w].T, bot[:w, :w].T], axis=0)

        lstm = rparams["lstm"]
        dl = {"w_hi": join(dwti, dwbi).astype(lstm["w_hi"].dtype),
              "w_hf": join(dwtf, dwbf).astype(lstm["w_hf"].dtype),
              "w_hg": join(dwtg, dwbg).astype(lstm["w_hg"].dtype),
              "w_ho": join(dwto, dwbo).astype(lstm["w_ho"].dtype),
              "b_hi": dbi[:w, 0].reshape(lstm["b_hi"].shape).astype(
                  lstm["b_hi"].dtype),
              "b_hf": dbf[:w, 0].reshape(lstm["b_hf"].shape).astype(
                  lstm["b_hf"].dtype),
              "b_hg": dbg[:w, 0].reshape(lstm["b_hg"].shape).astype(
                  lstm["b_hg"].dtype),
              "b_ho": dbo[:w, 0].reshape(lstm["b_ho"].shape).astype(
                  lstm["b_ho"].dtype)}
        drp = {"lstm": dl,
               "q_attn": {"w": dwqt[:w, :w].T.astype(
                   rparams["q_attn"]["w"].dtype)},
               "e_attn": {"w": dwe[:w].astype(
                   rparams["e_attn"]["w"].dtype)}}
        return (drp, dx_t[:w, :n].T.astype(x.dtype), None, None, None)

    op.defvjp(fwd, bwd)
    return op
