"""Pallas TPU fused SET2VEC readout kernel.

The att-family probe (round 3) attributed 3.9 ms of the 4.4 ms fused att
step to the XLA set2vec scan — 12 iterations of {tiny LSTM matmuls, a
per-node gather, a global softmax, a segment-sum scatter} on (N, 2nf)
tensors is pure small-op/scatter launch latency, dwarfing the 0.38 ms
message+GRU kernel. This kernel runs the ENTIRE T-step set2set loop
(Vinyals et al.; reference mpnn_functions/readout/set2vec.py:84-151,
'default' inner product, BATCH-GLOBAL softmax — the reference's dim-0
quirk, set2vec.py:139) in ONE forward and ONE backward pallas_call.

SEQUENTIAL-GRID formulation (round 5). The round-3/4 kernel Python-
unrolled steps × graph-blocks inside a grid=(1,) body, so the Mosaic
program grew O(T·batch) and the reference T=100 shape (set2vec.py:79)
could not compile over the remote-compile tunnel (T=12 at batch 2048
already blew its ~1h request timeout). A fori_loop rework wedged the
same way inside the scanned train program (git 9be3707 — the Mosaic
fori_loop + dynamic-lane-slice hazard). This third formulation uses the
proven kernels/recurrence.py pattern instead: grid=(time_steps,) with
the (mh, mr, c) carry in VMEM scratch persisted across the sequential
grid, per-step residual stashes as BLOCK-INDEXED outputs (one (wp, gp)
slot per grid step — Pallas pipelines the slot DMA under compute), and
the backward walking the same grid in reverse via reversed index maps.
The compiled body is now independent of BOTH T and batch; T only
multiplies the (cheap) grid trip count.

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

Residuals: the per-step carries (mh, mr, c; T slots, slot t = the carry
BEFORE step t+1) and att rows — everything else is recomputed in the
backward walk.

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
                    e_s, mh_c, mr_c, c_c,
                    *, steps: int, w: int, wp: int, nw: int, gb: int,
                    npad: int, batch_softmax: bool = True):
    """One set2vec step per grid iteration t (t = 0..steps−1, step t+1).
    Carry in scratch (mh_c, mr_c, c_c); this step's INPUT carry is
    stashed to the block-mapped slot outputs before the update."""
    dt = jnp.float32
    gw = GRAPH_BLOCK
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        mh_c[:] = jnp.zeros_like(mh_c)
        mr_c[:] = jnp.zeros_like(mr_c)
        c_c[:] = jnp.zeros_like(c_c)

    @pl.when(jax.lax.rem(t, 8) == 0)
    def _():
        # fresh 8-row att window: rows past `steps` would otherwise hold
        # whatever the out buffer contained (never read, but keep clean)
        att_out[:] = jnp.zeros_like(att_out)

    wt = {"i": wti_ref[:], "f": wtf_ref[:], "g": wtg_ref[:],
          "o": wto_ref[:]}
    wb = {"i": wbi_ref[:], "f": wbf_ref[:], "g": wbg_ref[:],
          "o": wbo_ref[:]}
    bs = {"i": bi_ref[:], "f": bf_ref[:], "g": bg_ref[:], "o": bo_ref[:]}
    amask = amask_ref[:]                   # (1, npad): −1e8 at pad nodes
    mh = mh_c[:]
    mr = mr_c[:]
    c = c_c[:]
    mhs_out[:] = mh          # slot t = carry BEFORE step t+1
    mrs_out[:] = mr
    cs_out[:] = c
    h, c_new, _gates = _lstm_fwd(mh, mr, c, wt, wb, bs)
    q = _dot(wqt_ref[:], h)                                # (wp, gp)
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
    att_out[pl.ds(jax.lax.rem(t, 8), 1), :] = e_s[0:1, :]
    # reads: overwrite the mr carry in place (its old value was already
    # consumed by the LSTM and stashed above)
    for j in range(gb):
        ns = pl.multiple_of(ns_ref[j], 128)
        og = _graph_onehot(ng_ref, ns, j, nw=nw, dtype=dt)
        xb = x_ref[:, pl.ds(ns, nw)]
        ab = e_s[0:1, pl.ds(ns, nw)]
        mr_c[:, j * gw:(j + 1) * gw] = _dot(xb * ab, og)
    mh_c[:] = h
    c_c[:] = c_new
    mh_out[:] = h
    mr_out[:] = mr_c[:]


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
                    datt_s, dq_s, dmh_c, dmr_c, dc_c,
                    *, steps: int, w: int, wp: int, nw: int, gb: int,
                    npad: int, batch_softmax: bool = True):
    """Reverse walk: grid iteration k processes step t = steps − k. The
    stash/att in_specs are block-mapped with REVERSED index maps, so
    mhs_ref/… already hold slot t−1 and att_ref the 8-row window
    containing row t−1. Cotangent carry (dmh, dmr, dc) in scratch; all
    gradient outputs use constant index maps (VMEM-resident) and
    accumulate across the grid."""
    dt = jnp.float32
    gw = GRAPH_BLOCK
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        dmh_c[:] = gmh_ref[:]
        dmr_c[:] = gmr_ref[:]
        dc_c[:] = jnp.zeros_like(dc_c)
        dx_out[:] = jnp.zeros_like(dx_out)
        for ref in (dwti_out, dwtf_out, dwtg_out, dwto_out,
                    dwbi_out, dwbf_out, dwbg_out, dwbo_out,
                    dbi_out, dbf_out, dbg_out, dbo_out,
                    dwqt_out, dwe_out):
            ref[:] = jnp.zeros_like(ref)

    wt = {"i": wti_ref[:], "f": wtf_ref[:], "g": wtg_ref[:],
          "o": wto_ref[:]}
    wb = {"i": wbi_ref[:], "f": wbf_ref[:], "g": wbg_ref[:],
          "o": wbo_ref[:]}
    bs = {"i": bi_ref[:], "f": bf_ref[:], "g": bg_ref[:], "o": bo_ref[:]}
    dmh = dmh_c[:]
    dmr = dmr_c[:]
    dc = dc_c[:]
    mh_p = mhs_ref[:]
    mr_p = mrs_ref[:]
    c_p = cs_ref[:]
    h, c_t, (i, f, g, o) = _lstm_fwd(mh_p, mr_p, c_p, wt, wb, bs)
    arow = jax.lax.rem(steps - 1 - k, 8)
    att = att_ref[pl.ds(arow, 1), :]
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
        dwe_out[:] += jnp.sum(th * deb, axis=1, keepdims=True)
        dth = we_ref[:] * deb * (1.0 - th * th)        # (wp, nw)
        dx_out[:, pl.ds(ns, nw)] += dth * own
        dq_s[:, j * gw:(j + 1) * gw] = _dot(dth, og)
    # --- q = wqt·h
    dq = dq_s[:]
    dwqt_out[:] += _dot(dq, h.T)
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
    dwti_out[:] += _dot(dai, mh_p.T)
    dwtf_out[:] += _dot(daf, mh_p.T)
    dwtg_out[:] += _dot(dag, mh_p.T)
    dwto_out[:] += _dot(dao, mh_p.T)
    dwbi_out[:] += _dot(dai, mr_p.T)
    dwbf_out[:] += _dot(daf, mr_p.T)
    dwbg_out[:] += _dot(dag, mr_p.T)
    dwbo_out[:] += _dot(dao, mr_p.T)
    dbi_out[:] += jnp.sum(dai, axis=1, keepdims=True)
    dbf_out[:] += jnp.sum(daf, axis=1, keepdims=True)
    dbg_out[:] += jnp.sum(dag, axis=1, keepdims=True)
    dbo_out[:] += jnp.sum(dao, axis=1, keepdims=True)
    dmh_c[:] = _dot(wt["i"].T, dai) + _dot(wt["f"].T, daf) \
        + _dot(wt["g"].T, dag) + _dot(wt["o"].T, dao)
    dmr_c[:] = _dot(wb["i"].T, dai) + _dot(wb["f"].T, daf) \
        + _dot(wb["g"].T, dag) + _dot(wb["o"].T, dao)
    dc_c[:] = dc


def _s2v_vmem(wp: int, npad: int, gp: int, n_node_panels: int,
              n_carry_panels: int):
    """VMEM-limit estimate for the GRIDDED kernels: the per-step live set
    is (wp, npad) node panels (x, dx, the 8-row energy/att scratch and
    stash blocks — counted via n_node_panels in wp-row units) plus a few
    (wp, gp) carry/stash-slot panels, all doubled for the pipeline's
    block double-buffering, independent of T. Measured on hardware at
    batch 1024 (npad=13184, gp=1024, T=12): fwd stack need 2.71 MB /
    bwd 7.35 MB — the counts below bound both with ~2× headroom."""
    est = (n_node_panels * wp * npad
           + 2 * n_carry_panels * wp * gp) * 4 * 2 + 4 * 2 ** 20
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
    wp = _round_up(w, 8)   # 8-sublane tiles: w=20 -> 24 (25% less VPU work in the per-step loops than 16-alignment)
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
        const = pl.BlockSpec((wp, gp), lambda t, ns_: (0, 0),
                             memory_space=pltpu.VMEM)
        slot = pl.BlockSpec((wp, gp), lambda t, ns_: (t, 0),
                            memory_space=pltpu.VMEM)
        attw = pl.BlockSpec((8, npad), lambda t, ns_: (t // 8, 0),
                            memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(time_steps,),
            in_specs=[_vm()] * 17,
            out_specs=(const, const, slot, slot, slot, attw),
            scratch_shapes=[
                pltpu.VMEM((8, npad), dt),       # energies / att row
                pltpu.VMEM((wp, gp), dt),        # mh carry
                pltpu.VMEM((wp, gp), dt),        # mr carry / read accum
                pltpu.VMEM((wp, gp), dt),        # c carry
            ],
        )
        wg = jax.ShapeDtypeStruct((wp, gp), dt)
        stash = jax.ShapeDtypeStruct((time_steps * wp, gp), dt)
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(wg, wg, stash, stash, stash,
                       jax.ShapeDtypeStruct((tp, npad), dt)),
            compiler_params=_s2v_vmem(wp, npad, gp, 5, 12),
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
        T = time_steps
        rslot = pl.BlockSpec((wp, gp), lambda k, ns_: (T - 1 - k, 0),
                             memory_space=pltpu.VMEM)
        rattw = pl.BlockSpec((8, npad),
                             lambda k, ns_: ((T - 1 - k) // 8, 0),
                             memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(time_steps,),
            in_specs=[_vm()] * 17 + [rslot, rslot, rslot, rattw,
                                     _vm(), _vm()],
            out_specs=tuple([_vm()] * 15),
            scratch_shapes=[
                pltpu.VMEM((8, npad), dt),       # datt / parked att / de
                pltpu.VMEM((wp, gp), dt),        # dq accumulator
                pltpu.VMEM((wp, gp), dt),        # dmh carry
                pltpu.VMEM((wp, gp), dt),        # dmr carry
                pltpu.VMEM((wp, gp), dt),        # dc carry
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
            compiler_params=_s2v_vmem(wp, npad, gp, 6, 14),
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
