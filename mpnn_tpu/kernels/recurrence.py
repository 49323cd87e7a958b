"""Pallas TPU fused message-passing recurrence — the flagship hot loop.

For the lipo flagship config (shared message weights, messages computed
from the INITIAL node features — lipo_basic_model.py:85 — one shared
ma_bn/bn pair, GRU update), the per-step message aggregation is CONSTANT
across the 6 steps (XLA CSEs the SpMM), so the remaining per-step work is

    mb  = ma_bn(msgs)                        (once — msgs constant)
    h_t = bn( GRU(mb, h_{t-1}, mask) )       (×T)

which XLA executes as ~40 small ops per step, each a separate HBM round
trip over (N, 10)-wide tensors. This kernel runs the WHOLE chain in one
pallas_call with every operand resident in VMEM.

Layout: everything TRANSPOSED to (features, N) — lanes = nodes — so a
13k-node state occupies (16, N) physical tiles (844 KB) instead of the
(N, 128)-lane-padded 6.7 MB of the row layout: 12× less VMEM and every
lane does real work. BN reductions are lane-axis sums; GRU matmuls are
(f, f) × (f, N) with the huge dimension in lanes.

Mosaic discipline (learned the hard way): NO sub-tile slicing anywhere —
gate weights arrive as six separate (fp, fp) blocks, biases and affine
params as (fp, 1) columns, the mask as a (1, N) row; padded feature rows
carry junk through elementwise ops but never reach real rows (weight pads
are zero) and are sliced off OUTSIDE the kernel in XLA.

Backward is a second kernel: replays the forward storing the T step inputs
in VMEM scratch, then walks the chain in reverse with the masked-BN
gradient in closed form:

    dh̃ = (1/d)·(dx̂ − m·S1/c) − m·x̂·S2/(c·s),  s=√v, d=s+ε,
    S1 = Σ dx̂,  S2 = Σ dx̂·x̂                   (per feature row)

Verified against jax.vjp of the pure-JAX reference (tests/test_kernels.py
::TestRecurrence, interpret mode); the reference is itself verified
against sparse_mpnn_apply's step loop.

Constraints: share_message_weights, message_input='initial',
msg_norm=state_norm='bn1d', per_step_norms=False, update_hidden='state',
training mode, N divisible by 128 (node caps already are).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BN_EPS = 1e-5
VAR_CLAMP = 1e-12
# the stateless masked BN (reference MaskBatchNorm, mask_batch_norm.py:5-15
# via ops/norm.py::mask_batch_norm): eps INSIDE the sqrt, no affine, no
# running stats, no clamp
STATELESS_EPS = 1e-6


# ---------------------------------------------------------------------------
# pure-JAX reference (parity oracle; same math as sparse_mpnn_apply's loop)
# ---------------------------------------------------------------------------

def reference_recurrence(msgs, h0, mask, gru, ma_bn, bn, *, steps: int,
                         msg_norm: str = "bn1d", state_norm: str = "bn1d"):
    """msgs, h0: (N, f); mask: (N, 1). Returns (hT, (ma_mean, ma_var),
    [(mean_t, var_t)]×steps) — stats for the caller's running EMAs (zeros
    for 'stateless'/'none' norms, which keep none).

    msg_norm ∈ {bn1d, none}; state_norm ∈ {bn1d, stateless, none} — the
    config space of the reference model zoo (MPNNConfig.msg_norm /
    state_norm): the lipo family is bn1d/bn1d, basic/single_target/
    autoencoder are none/none, graph_norm's state norm is the stateless
    MaskBatchNorm."""
    from mpnn_tpu.ops.norm import mask_batch_norm
    from mpnn_tpu.ops.update import gru_apply

    def bn_fwd(p, x):
        m = mask.astype(x.dtype)
        total = (x * m).sum(axis=0)
        c = m.sum()
        mean = total / c
        var = ((((x - mean) * m) ** 2).sum(axis=0)) / c
        out = (x - mean) / (jnp.sqrt(jnp.maximum(var, VAR_CLAMP)) + BN_EPS)
        out = (p["weight"] * out + p["bias"]) * m
        return out, (mean, var)

    zstat = (jnp.zeros(msgs.shape[-1], msgs.dtype),
             jnp.zeros(msgs.shape[-1], msgs.dtype))
    if msg_norm == "bn1d":
        mb, ma_stats = bn_fwd(ma_bn, msgs)
    else:
        mb, ma_stats = msgs * mask, zstat
    h = h0 * mask
    step_stats = []
    for _ in range(steps):
        h = gru_apply(gru, mb[None], h[None], mask[None])[0]
        if state_norm == "bn1d":
            h, st = bn_fwd(bn, h)
        elif state_norm == "stateless":
            h, st = mask_batch_norm(h, mask), zstat
        else:
            st = zstat
        step_stats.append(st)
    return h, ma_stats, step_stats


# ---------------------------------------------------------------------------
# in-kernel helpers (transposed (fp, N) layout; no sub-tile slicing)
# ---------------------------------------------------------------------------

def _bn_fwd_t(x, mask_l, w_col, b_col, c):
    mean = jnp.sum(x * mask_l, axis=1, keepdims=True) / c
    cen = (x - mean) * mask_l
    var = jnp.sum(cen * cen, axis=1, keepdims=True) / c
    xhat = cen / (jnp.sqrt(jnp.maximum(var, VAR_CLAMP)) + BN_EPS)
    return (w_col * xhat + b_col) * mask_l, mean, var


def _norm_fwd_t(x, mask_l, w_col, b_col, c, mode: str):
    """Mode-dispatching masked norm, transposed layout. x must be
    PRE-MASKED. Returns (out, mean, var) — mean/var zeros for 'none'
    (slots stay allocated so residual layouts are mode-uniform)."""
    if mode == "bn1d":
        return _bn_fwd_t(x, mask_l, w_col, b_col, c)
    if mode == "none":
        z = jnp.zeros((x.shape[0], 1), x.dtype)
        return x, z, z
    # stateless MaskBatchNorm: no affine, eps inside the sqrt
    mean = jnp.sum(x * mask_l, axis=1, keepdims=True) / c
    cen = (x - mean) * mask_l
    var = jnp.sum(cen * cen, axis=1, keepdims=True) / c
    return cen / jnp.sqrt(var + STATELESS_EPS), mean, var


def _norm_denoms(var, mode: str):
    """(s, d) for the closed-form masked-norm backward
    dx = (dx̂ − m·S1/c)/d − m·x̂·S2/(c·s): bn1d normalizes by
    d = √max(var,clamp) + ε with s = √var; the stateless norm by
    d = s = √(var + ε₆) (both factors coincide — dD/dσ² = 1/(2D))."""
    if mode == "stateless":
        s = jnp.sqrt(var + STATELESS_EPS)
        return s, s
    s = jnp.sqrt(jnp.maximum(var, VAR_CLAMP))
    return s, s + BN_EPS


def _bn_bwd_t(gy, x, mask_l, w_col, c):
    """x is the PRE-BN input (masked). Returns (dx, dw_col, db_col)."""
    mean = jnp.sum(x * mask_l, axis=1, keepdims=True) / c
    cen = (x - mean) * mask_l
    var = jnp.sum(cen * cen, axis=1, keepdims=True) / c
    s = jnp.sqrt(jnp.maximum(var, VAR_CLAMP))
    d = s + BN_EPS
    xhat = cen / d
    gym = gy * mask_l
    dw = jnp.sum(gym * xhat, axis=1, keepdims=True)
    db = jnp.sum(gym, axis=1, keepdims=True)
    dxhat = gym * w_col
    s1 = jnp.sum(dxhat, axis=1, keepdims=True)
    s2 = jnp.sum(dxhat * xhat, axis=1, keepdims=True)
    dx = (dxhat - mask_l * s1 / c) / d - mask_l * xhat * s2 / (c * s)
    return dx, dw, db


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _gru_fwd_t(h, gr, gz, gn, whr, whz, whn, bhr, bhz, bhn, mask_l):
    rh = _dot(whr.T, h) + bhr
    zh = _dot(whz.T, h) + bhz
    nh = _dot(whn.T, h) + bhn
    r = jax.nn.sigmoid(gr + rh) * mask_l
    z = jax.nn.sigmoid(gz + zh) * mask_l
    n = jnp.tanh(gn + r * nh) * mask_l
    return ((1.0 - z) * n + z * h) * mask_l


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(msgs_ref, h0_ref, mask_ref,
                wir_ref, wiz_ref, win_ref, whr_ref, whz_ref, whn_ref,
                bir_ref, biz_ref, bin_ref, bhr_ref, bhz_ref, bhn_ref,
                mw_ref, mb_ref, sw_ref, sb_ref,
                h_out, ma_mean_out, ma_var_out, bn_mean_out, bn_var_out,
                *, steps: int, fp: int):
    mask_l = mask_ref[:]                               # (1, N)
    c = jnp.sum(mask_l)
    mb, ma_mean, ma_var = _bn_fwd_t(msgs_ref[:] * mask_l, mask_l,
                                    mw_ref[:], mb_ref[:], c)
    ma_mean_out[:] = ma_mean
    ma_var_out[:] = ma_var
    gr = _dot(wir_ref[:].T, mb) + bir_ref[:]
    gz = _dot(wiz_ref[:].T, mb) + biz_ref[:]
    gn = _dot(win_ref[:].T, mb) + bin_ref[:]

    h = h0_ref[:] * mask_l
    for t in range(steps):
        h = _gru_fwd_t(h, gr, gz, gn, whr_ref[:], whz_ref[:], whn_ref[:],
                       bhr_ref[:], bhz_ref[:], bhn_ref[:], mask_l)
        h, mean, var = _bn_fwd_t(h, mask_l, sw_ref[:], sb_ref[:], c)
        bn_mean_out[t * fp:(t + 1) * fp, :] = mean
        bn_var_out[t * fp:(t + 1) * fp, :] = var
    h_out[:] = h


# ---------------------------------------------------------------------------
# backward kernel (recompute forward, reverse walk)
# ---------------------------------------------------------------------------

def _bwd_kernel(msgs_ref, h0_ref, mask_ref,
                wir_ref, wiz_ref, win_ref, whr_ref, whz_ref, whn_ref,
                bir_ref, biz_ref, bin_ref, bhr_ref, bhz_ref, bhn_ref,
                mw_ref, mb_ref, sw_ref, sb_ref, g_ref,
                dmsgs_out, dh0_out,
                dwir_out, dwiz_out, dwin_out, dwhr_out, dwhz_out, dwhn_out,
                dbir_out, dbiz_out, dbin_out, dbhr_out, dbhz_out, dbhn_out,
                dmw_out, dmb_out, dsw_out, dsb_out,
                hs,
                *, steps: int, fp: int):
    mask_l = mask_ref[:]
    c = jnp.sum(mask_l)
    msgs_m = msgs_ref[:] * mask_l
    mb, _, _ = _bn_fwd_t(msgs_m, mask_l, mw_ref[:], mb_ref[:], c)
    gr = _dot(wir_ref[:].T, mb) + bir_ref[:]
    gz = _dot(wiz_ref[:].T, mb) + biz_ref[:]
    gn = _dot(win_ref[:].T, mb) + bin_ref[:]
    whr = whr_ref[:]
    whz = whz_ref[:]
    whn = whn_ref[:]
    bhr = bhr_ref[:]
    bhz = bhz_ref[:]
    bhn = bhn_ref[:]
    sw = sw_ref[:]
    sb = sb_ref[:]

    # forward replay: stash h_{t-1}; h̃_t is recomputed in the reverse walk
    h = h0_ref[:] * mask_l
    for t in range(steps):
        hs[t * fp:(t + 1) * fp, :] = h
        h = _gru_fwd_t(h, gr, gz, gn, whr, whz, whn, bhr, bhz, bhn, mask_l)
        h, _, _ = _bn_fwd_t(h, mask_l, sw, sb, c)

    gh = g_ref[:]
    dsw = jnp.zeros_like(sw)
    dsb = jnp.zeros_like(sb)
    dmb_acc = jnp.zeros_like(gh)
    dwhr = jnp.zeros_like(whr)
    dwhz = jnp.zeros_like(whz)
    dwhn = jnp.zeros_like(whn)
    dbhr = jnp.zeros_like(bhr)
    dbhz = jnp.zeros_like(bhz)
    dbhn = jnp.zeros_like(bhn)
    dwir_acc = jnp.zeros_like(whr)
    dwiz_acc = jnp.zeros_like(whz)
    dwin_acc = jnp.zeros_like(whn)
    dbir_acc = jnp.zeros_like(bhr)
    dbiz_acc = jnp.zeros_like(bhz)
    dbin_acc = jnp.zeros_like(bhn)
    for t in range(steps - 1, -1, -1):
        hprev = hs[t * fp:(t + 1) * fp, :]
        # recompute GRU internals (and h̃_t) of step t
        rh = _dot(whr.T, hprev) + bhr
        zh = _dot(whz.T, hprev) + bhz
        nh = _dot(whn.T, hprev) + bhn
        sr = jax.nn.sigmoid(gr + rh)
        sz = jax.nn.sigmoid(gz + zh)
        r = sr * mask_l
        z = sz * mask_l
        tn = jnp.tanh(gn + r * nh)
        n = tn * mask_l
        htil = ((1.0 - z) * n + z * hprev) * mask_l
        dhtil, dw_t, db_t = _bn_bwd_t(gh, htil, mask_l, sw, c)
        dsw += dw_t
        dsb += db_t
        dhp = dhtil * mask_l                       # through the final ·m
        dz = dhp * (hprev - n)
        dn = dhp * (1.0 - z)
        gh_new = dhp * z
        da_n = dn * mask_l * (1.0 - tn * tn)
        dr = da_n * nh
        dnh = da_n * r
        da_r = dr * mask_l * sr * (1.0 - sr)
        da_z = dz * mask_l * sz * (1.0 - sz)
        gh_new = gh_new + _dot(whr, da_r) + _dot(whz, da_z) \
            + _dot(whn, dnh)
        dwhr += _dot(hprev, da_r.T)
        dwhz += _dot(hprev, da_z.T)
        dwhn += _dot(hprev, dnh.T)
        dbhr += jnp.sum(da_r, axis=1, keepdims=True)
        dbhz += jnp.sum(da_z, axis=1, keepdims=True)
        dbhn += jnp.sum(dnh, axis=1, keepdims=True)
        dmb_acc = dmb_acc + _dot(wir_ref[:], da_r) \
            + _dot(wiz_ref[:], da_z) + _dot(win_ref[:], da_n)
        dwir_acc += _dot(mb, da_r.T)
        dwiz_acc += _dot(mb, da_z.T)
        dwin_acc += _dot(mb, da_n.T)
        dbir_acc += jnp.sum(da_r, axis=1, keepdims=True)
        dbiz_acc += jnp.sum(da_z, axis=1, keepdims=True)
        dbin_acc += jnp.sum(da_n, axis=1, keepdims=True)
        gh = gh_new

    dh0_out[:] = gh * mask_l
    dmb_total = dmb_acc
    dwir_out[:] = dwir_acc
    dwiz_out[:] = dwiz_acc
    dwin_out[:] = dwin_acc
    dwhr_out[:] = dwhr
    dwhz_out[:] = dwhz
    dwhn_out[:] = dwhn
    dbir_out[:] = dbir_acc
    dbiz_out[:] = dbiz_acc
    dbin_out[:] = dbin_acc
    dbhr_out[:] = dbhr
    dbhz_out[:] = dbhz
    dbhn_out[:] = dbhn
    dsw_out[:] = dsw
    dsb_out[:] = dsb
    dmsgs, dmw, dmbias = _bn_bwd_t(dmb_total, msgs_m, mask_l, mw_ref[:], c)
    dmsgs_out[:] = dmsgs * mask_l
    dmw_out[:] = dmw
    dmb_out[:] = dmbias


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------

def _round_up(x, m):
    return -(-x // m) * m


def make_recurrence_op(steps: int, f: int, n: int, *,
                       interpret: bool = False, bwd_mode: str = "auto"):
    """Fused flagship recurrence for (N=n, features=f), T=steps.
    Returns op(msgs (N,f), h0 (N,f), mask (N,1), gru, ma_bn, bn) →
    (hT (N,f), (ma_mean, ma_var), [(mean_t, var_t)]×steps).
    n is padded internally to a 128-lane multiple.

    bwd_mode: 'fused' (second Pallas kernel - needs the T stashed states
    plus the reverse walk's live set in VMEM, ~(T+14)*fp rows), 'xla'
    (jax.vjp of the pure reference - exact same math, many small ops), or
    'auto' (fused when the estimate fits the 16MB scoped-VMEM budget)."""
    npad = _round_up(n, 128)
    fp = _round_up(f, 16)
    if bwd_mode == "auto":
        est = (steps + 14) * fp * npad * 4
        bwd_mode = "fused" if est <= 13 * 2 ** 20 else "xla"

    def _vm():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    def pack(msgs, h0, mask, gru, ma_bn, bn):
        dt = jnp.float32
        padf = ((0, 0), (0, fp - f))

        def mat_t(x):                    # (N, f) row → (fp, Npad) transposed
            return jnp.pad(x.astype(dt), padf).T if npad == n else \
                jnp.pad(jnp.pad(x.astype(dt), padf).T,
                        ((0, 0), (0, npad - n)))

        def blocks(w):                   # (f, 3f) → three (fp, fp)
            b = w.astype(dt).reshape(f, 3, f)
            return [jnp.pad(b[:, k, :], ((0, fp - f), (0, fp - f)))
                    for k in range(3)]

        def col3(v):                     # (3f,) → three (fp, 1)
            b = v.astype(dt).reshape(3, f)
            return [jnp.pad(b[k][:, None], ((0, fp - f), (0, 0)))
                    for k in range(3)]

        def col(v):                      # (f,) → (fp, 1)
            return jnp.pad(v.astype(dt)[:, None], ((0, fp - f), (0, 0)))

        wi = blocks(gru["w_ih"])
        wh = blocks(gru["w_hh"])
        bi = col3(gru["b_ih"])
        bh = col3(gru["b_hh"])
        mask_row = jnp.pad(mask.astype(dt).reshape(1, n),
                           ((0, 0), (0, npad - n)))
        return ([mat_t(msgs), mat_t(h0), mask_row]
                + wi + wh + bi + bh
                + [col(ma_bn["weight"]), col(ma_bn["bias"]),
                   col(bn["weight"]), col(bn["bias"])])

    fwd_kernel = functools.partial(_fwd_kernel, steps=steps, fp=fp)
    bwd_kernel = functools.partial(_bwd_kernel, steps=steps, fp=fp)

    @jax.custom_vjp
    def op(msgs, h0, mask, gru, ma_bn, bn):
        packed = pack(msgs, h0, mask, gru, ma_bn, bn)
        h_t, ma_m, ma_v, bn_m, bn_v = pl.pallas_call(
            fwd_kernel,
            in_specs=[_vm()] * 19,
            out_specs=tuple([_vm()] * 5),
            out_shape=(
                jax.ShapeDtypeStruct((fp, npad), jnp.float32),
                jax.ShapeDtypeStruct((fp, 1), jnp.float32),
                jax.ShapeDtypeStruct((fp, 1), jnp.float32),
                jax.ShapeDtypeStruct((steps * fp, 1), jnp.float32),
                jax.ShapeDtypeStruct((steps * fp, 1), jnp.float32),
            ),
            interpret=interpret,
        )(*packed)
        dt = msgs.dtype   # uniform output dtype (mixed outputs break vjp)
        ma_stats = (ma_m[:f, 0].astype(dt), ma_v[:f, 0].astype(dt))
        step_stats = [(bn_m[t * fp:t * fp + f, 0].astype(dt),
                       bn_v[t * fp:t * fp + f, 0].astype(dt))
                      for t in range(steps)]
        return (h_t[:f, :n].T.astype(msgs.dtype), ma_stats,
                step_stats)

    def fwd(msgs, h0, mask, gru, ma_bn, bn):
        return (op(msgs, h0, mask, gru, ma_bn, bn),
                (msgs, h0, mask, gru, ma_bn, bn))

    def bwd(res, cot):
        msgs, h0, mask, gru, ma_bn, bn = res
        if bwd_mode == "xla":
            # exact same math through the pure reference (stats cotangents
            # ride along - they are zeros when only the loss is grad'd)
            _, vjp = jax.vjp(
                lambda m_, h_, g_, a_, b_: reference_recurrence(
                    m_, h_, mask, g_, a_, b_, steps=steps),
                msgs, h0, gru, ma_bn, bn)
            dm, dh, dg, da_, db_ = vjp(cot)
            return dm, dh, None, dg, da_, db_
        g_ht, _, _ = cot          # stats feed running-state EMAs (no grad)
        packed = pack(msgs, h0, mask, gru, ma_bn, bn)
        g_t = jnp.pad(g_ht.astype(jnp.float32),
                      ((0, 0), (0, fp - f))).T
        if npad != n:
            g_t = jnp.pad(g_t, ((0, 0), (0, npad - n)))
        fpn = jax.ShapeDtypeStruct((fp, npad), jnp.float32)
        fpf = jax.ShapeDtypeStruct((fp, fp), jnp.float32)
        fc = jax.ShapeDtypeStruct((fp, 1), jnp.float32)
        outs = pl.pallas_call(
            bwd_kernel,
            in_specs=[_vm()] * 20,
            out_specs=tuple([_vm()] * 18),
            out_shape=(fpn, fpn, fpf, fpf, fpf, fpf, fpf, fpf,
                       fc, fc, fc, fc, fc, fc, fc, fc, fc, fc),
            scratch_shapes=[
                pltpu.VMEM((steps * fp, npad), jnp.float32),
            ],
            interpret=interpret,
        )(*packed, g_t)
        (dmsgs_t, dh0_t, dwir, dwiz, dwin, dwhr, dwhz, dwhn,
         dbir, dbiz, dbin_, dbhr, dbhz, dbhn, dmw, dmbb, dsw, dsb) = outs

        def unblocks(ws):                # three (fp, fp) → (f, 3f)
            return jnp.stack([w[:f, :f] for w in ws], axis=1) \
                .reshape(f, 3 * f)

        def uncol3(cs):                  # three (fp, 1) → (3f,)
            return jnp.concatenate([cv[:f, 0] for cv in cs])

        dgru = {
            "w_ih": unblocks([dwir, dwiz, dwin]).astype(
                gru["w_ih"].dtype),
            "w_hh": unblocks([dwhr, dwhz, dwhn]).astype(
                gru["w_hh"].dtype),
            "b_ih": uncol3([dbir, dbiz, dbin_]).astype(gru["b_ih"].dtype),
            "b_hh": uncol3([dbhr, dbhz, dbhn]).astype(gru["b_hh"].dtype),
        }
        dma = {"weight": dmw[:f, 0].astype(ma_bn["weight"].dtype),
               "bias": dmbb[:f, 0].astype(ma_bn["bias"].dtype)}
        dbn = {"weight": dsw[:f, 0].astype(bn["weight"].dtype),
               "bias": dsb[:f, 0].astype(bn["bias"].dtype)}
        return (dmsgs_t[:f, :n].T.astype(msgs.dtype),
                dh0_t[:f, :n].T.astype(h0.dtype), None, dgru, dma, dbn)

    op.defvjp(fwd, bwd)
    return op


# ---------------------------------------------------------------------------
# node-BLOCKED forward (any N): grid (T+1, 2, node-blocks)
# ---------------------------------------------------------------------------
#
# The monolithic kernel above needs the whole (fp, N) state set in VMEM —
# fine to ~20k nodes. For larger batches this variant streams node BLOCKS
# from HBM: every (step, phase) makes one pass over the blocks,
#   phase 0: compute (GRU for steps ≥ 1; the ma_bn input pass for step 0),
#            write h̃ blocks to an HBM buffer, accumulate Σx and Σx² per
#            feature in VMEM accumulators (grid is sequential);
#   phase 1: finalize stats at block 0 (single-pass variance E[x²] − μ² —
#            documented numerical difference vs the two-pass reference,
#            covered by a looser test tolerance), then normalize + affine +
#            mask each block and write the new state (and for step 0, also
#            the constant GRU input-gate contributions g_r/z/n).
# The forward writes SLOTTED residual buffers (pre-BN inputs per grid step,
# post-BN states per step, the gates, raw stats) so the blocked BACKWARD
# below can walk the chain in reverse without a monolithic replay.

def _blocked_kernel(msgs_hbm, h0_hbm, mask_hbm, c_ref,
                    wir_ref, wiz_ref, win_ref, whr_ref, whz_ref, whn_ref,
                    bir_ref, biz_ref, bin_ref, bhr_ref, bhz_ref, bhn_ref,
                    mw_ref, mb_ref, sw_ref, sb_ref,
                    gates_hbm, htil_hbm, h_hbm, stats_out,
                    xblk, gblk, mblk, acc, stats, sems,
                    *, steps: int, fp: int, blk: int):
    t = pl.program_id(0)
    p = pl.program_id(1)
    b = pl.program_id(2)
    nb = pl.num_programs(2)
    c = c_ref[0, 0]
    off = b * blk

    @pl.when(jnp.logical_and(jnp.logical_and(t == 0, p == 0), b == 0))
    def _():
        acc[:] = jnp.zeros_like(acc)

    @pl.when(p == 0)
    def _():
        # load the mask block once per (t, phase-0, b)
        cpm = pltpu.make_async_copy(mask_hbm.at[:, pl.ds(off, blk)], mblk,
                                    sems.at[0])
        cpm.start()

        @pl.when(t == 0)
        def _():
            cpx = pltpu.make_async_copy(msgs_hbm.at[:, pl.ds(off, blk)],
                                        xblk, sems.at[1])
            cpx.start()
            cpx.wait()
            cpm.wait()
            # stage the masked msgs into htil slot 0 as the phase-1 input
            x = xblk[:] * mblk[:]
            xblk[:] = x
            wb = pltpu.make_async_copy(
                xblk, htil_hbm.at[pl.ds(0, fp), pl.ds(off, blk)],
                sems.at[1])
            wb.start()
            acc[:, 0:1] += jnp.sum(x, axis=1, keepdims=True)
            acc[:, 1:2] += jnp.sum(x * x, axis=1, keepdims=True)
            wb.wait()

        @pl.when(t > 0)
        def _():
            # previous state s_{t-1}: h0 for step 1, slot t-2 after
            @pl.when(t == 1)
            def _():
                cph = pltpu.make_async_copy(
                    h0_hbm.at[:, pl.ds(off, blk)], xblk, sems.at[1])
                cph.start()
                cph.wait()

            @pl.when(t > 1)
            def _():
                cph = pltpu.make_async_copy(
                    h_hbm.at[pl.ds((t - 2) * fp, fp), pl.ds(off, blk)],
                    xblk, sems.at[1])
                cph.start()
                cph.wait()
            cpg = pltpu.make_async_copy(
                gates_hbm.at[:, pl.ds(off, blk)], gblk, sems.at[2])
            cpg.start()
            cpg.wait()
            cpm.wait()
            h = xblk[:]
            m = mblk[:]
            gr = gblk[0 * fp:1 * fp, :]
            gz = gblk[1 * fp:2 * fp, :]
            gn = gblk[2 * fp:3 * fp, :]
            htil = _gru_fwd_t(h, gr, gz, gn, whr_ref[:], whz_ref[:],
                              whn_ref[:], bhr_ref[:], bhz_ref[:],
                              bhn_ref[:], m)
            xblk[:] = htil
            wb = pltpu.make_async_copy(
                xblk, htil_hbm.at[pl.ds(t * fp, fp), pl.ds(off, blk)],
                sems.at[1])
            wb.start()
            acc[:, 0:1] += jnp.sum(htil, axis=1, keepdims=True)
            acc[:, 1:2] += jnp.sum(htil * htil, axis=1, keepdims=True)
            wb.wait()

    @pl.when(p == 1)
    def _():
        @pl.when(b == 0)
        def _():
            mean = acc[:, 0:1] / c
            var = jnp.maximum(acc[:, 1:2] / c - mean * mean, 0.0)
            stats[:, 0:1] = mean
            stats[:, 1:2] = var
            stats_out[pl.ds(t * fp, fp), 0:1] = mean
            stats_out[pl.ds(t * fp, fp), 1:2] = var
            acc[:] = jnp.zeros_like(acc)

        cpx = pltpu.make_async_copy(
            htil_hbm.at[pl.ds(t * fp, fp), pl.ds(off, blk)], xblk,
            sems.at[1])
        cpm = pltpu.make_async_copy(mask_hbm.at[:, pl.ds(off, blk)], mblk,
                                    sems.at[0])
        cpx.start()
        cpm.start()
        cpx.wait()
        cpm.wait()
        m = mblk[:]
        mean = stats[:, 0:1]
        var = stats[:, 1:2]
        xhat = ((xblk[:] - mean) * m) \
            / (jnp.sqrt(jnp.maximum(var, VAR_CLAMP)) + BN_EPS)

        @pl.when(t == 0)
        def _():
            mbv = (mw_ref[:] * xhat + mb_ref[:]) * m
            gblk[0 * fp:1 * fp, :] = _dot(wir_ref[:].T, mbv) + bir_ref[:]
            gblk[1 * fp:2 * fp, :] = _dot(wiz_ref[:].T, mbv) + biz_ref[:]
            gblk[2 * fp:3 * fp, :] = _dot(win_ref[:].T, mbv) + bin_ref[:]
            wbg = pltpu.make_async_copy(
                gblk, gates_hbm.at[:, pl.ds(off, blk)], sems.at[2])
            wbg.start()
            wbg.wait()

        @pl.when(t > 0)
        def _():
            xblk[:] = (sw_ref[:] * xhat + sb_ref[:]) * m
            wbh = pltpu.make_async_copy(
                xblk, h_hbm.at[pl.ds((t - 1) * fp, fp), pl.ds(off, blk)],
                sems.at[1])
            wbh.start()
            wbh.wait()


def _pack_blocked(msgs, h0, mask, gru, ma_bn, bn, *, f, fp, n, npad):
    """Transposed/padded operand list shared by the blocked fwd and bwd."""
    dt = jnp.float32
    padf = ((0, 0), (0, fp - f))

    def mat_t(x):
        xt = jnp.pad(x.astype(dt), padf).T
        return jnp.pad(xt, ((0, 0), (0, npad - n)))

    def blocks(w):
        bmat = w.astype(dt).reshape(f, 3, f)
        return [jnp.pad(bmat[:, k, :], ((0, fp - f), (0, fp - f)))
                for k in range(3)]

    def col3(v):
        bmat = v.astype(dt).reshape(3, f)
        return [jnp.pad(bmat[k][:, None], ((0, fp - f), (0, 0)))
                for k in range(3)]

    def col(v):
        return jnp.pad(v.astype(dt)[:, None], ((0, fp - f), (0, 0)))

    mask_row = jnp.pad(mask.astype(dt).reshape(1, n),
                       ((0, 0), (0, npad - n)))
    c = jnp.sum(mask_row).reshape(1, 1)
    wi = blocks(gru["w_ih"])
    wh = blocks(gru["w_hh"])
    bi = col3(gru["b_ih"])
    bh = col3(gru["b_hh"])
    h0m = mat_t(h0 * mask)
    return ([mat_t(msgs), h0m, mask_row, c]
            + wi + wh + bi + bh
            + [col(ma_bn["weight"]), col(ma_bn["bias"]),
               col(bn["weight"]), col(bn["bias"])]), mat_t


def _blocked_forward_call(msgs, h0, mask, gru, ma_bn, bn, *, steps, f, n,
                          blk, interpret):
    """Run the blocked forward kernel; returns (hT, ma_stats, step_stats)
    plus the residual buffers (gates, htil slots, h slots, raw stats) the
    blocked backward consumes."""
    fp = _round_up(f, 16)
    npad = _round_up(n, blk)
    nb = npad // blk
    dt = jnp.float32

    def _vm():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    def _any():
        return pl.BlockSpec(memory_space=pltpu.ANY)

    kernel = functools.partial(_blocked_kernel, steps=steps, fp=fp, blk=blk)
    args, _ = _pack_blocked(msgs, h0, mask, gru, ma_bn, bn,
                            f=f, fp=fp, n=n, npad=npad)
    gates, htil, h_all, stats = pl.pallas_call(
        kernel,
        grid=(steps + 1, 2, nb),
        in_specs=[_any(), _any(), _any(),
                  pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [_vm()] * 16,
        out_specs=(_any(), _any(), _any(), _vm()),
        out_shape=(
            jax.ShapeDtypeStruct((3 * fp, npad), dt),
            jax.ShapeDtypeStruct(((steps + 1) * fp, npad), dt),
            jax.ShapeDtypeStruct((steps * fp, npad), dt),
            jax.ShapeDtypeStruct(((steps + 1) * fp, 2), dt),
        ),
        scratch_shapes=[
            pltpu.VMEM((fp, blk), dt),          # xblk
            pltpu.VMEM((3 * fp, blk), dt),      # gblk
            pltpu.VMEM((1, blk), dt),           # mblk
            pltpu.VMEM((fp, 2), dt),            # acc
            pltpu.VMEM((fp, 2), dt),            # stats
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(*args)
    odt = msgs.dtype
    ma_stats = (stats[0 * fp:0 * fp + f, 0].astype(odt),
                stats[0 * fp:0 * fp + f, 1].astype(odt))
    step_stats = [(stats[(t + 1) * fp:(t + 1) * fp + f, 0].astype(odt),
                   stats[(t + 1) * fp:(t + 1) * fp + f, 1].astype(odt))
                  for t in range(steps)]
    h_fin = h_all[(steps - 1) * fp:(steps - 1) * fp + f, :n].T
    return ((h_fin.astype(odt), ma_stats, step_stats),
            (gates, htil, h_all, stats))


def make_blocked_recurrence_fwd(steps: int, f: int, n: int, *,
                                blk: int = 8192, interpret: bool = False):
    """Blocked forward for any node count. Returns
    fwd(msgs, h0, mask, gru, ma_bn, bn) → (hT, ma_stats, step_stats) with
    the same contract as make_recurrence_op (variance is single-pass)."""

    def fwd(msgs, h0, mask, gru, ma_bn, bn):
        out, _ = _blocked_forward_call(msgs, h0, mask, gru, ma_bn, bn,
                                       steps=steps, f=f, n=n, blk=blk,
                                       interpret=interpret)
        return out

    return fwd


# ---------------------------------------------------------------------------
# node-BLOCKED backward: grid (T+1, 2, node-blocks), steps walked in REVERSE
# ---------------------------------------------------------------------------
#
# Consumes the forward's slotted residuals. Reversed step t = steps - ts:
#   phase 0 (reduction): per block, recompute x̂_t from the stashed pre-BN
#     input (htil slot t) + the forward's own stats; accumulate the masked-BN
#     backward's global sums S1 = Σ dx̂, S2 = Σ dx̂·x̂ (and dsw/dsb).
#   phase 1 (apply): per block, closed-form BN input-gradient, then the GRU
#     backward (internals recomputed from the stashed s_{t-1} + gates);
#     writes the new cotangent gh ← ∂L/∂s_{t-1} in place (HBM buffer aliased
#     from the incoming cotangent) and accumulates the per-node dmb
#     (cotangent of the BN'd messages) into an HBM buffer; weight/bias
#     gradients accumulate in VMEM outputs (sequential grid).
# Final grid step ts == steps: masked-BN backward of ma_bn over the messages
# with cotangent dmb (same two-phase reduction/apply pattern) → dmsgs.

def _blocked_bwd_kernel(h0_hbm, hs_hbm, htil_hbm, gates_hbm, mask_hbm,
                        c_ref,
                        wir_ref, wiz_ref, win_ref, whr_ref, whz_ref,
                        whn_ref, bhr_ref, bhz_ref, bhn_ref,
                        mw_ref, mbias_ref, sw_ref, stats_ref, g_in,
                        gh_hbm, dmb_hbm, dmsgs_hbm,
                        dwir_out, dwiz_out, dwin_out,
                        dwhr_out, dwhz_out, dwhn_out,
                        dbir_out, dbiz_out, dbin_out,
                        dbhr_out, dbhz_out, dbhn_out,
                        dmw_out, dmbias_out, dsw_out, dsb_out,
                        sblk, gblk, mblk, ghblk, hblk, mbblk, dmbblk,
                        accS, sems,
                        *, steps: int, fp: int, blk: int):
    ts = pl.program_id(0)
    p = pl.program_id(1)
    b = pl.program_id(2)
    t = steps - ts                      # reversed step index (ts < steps)
    off = b * blk
    c = c_ref[0, 0]

    def _load(src, dst, i):
        cp = pltpu.make_async_copy(src, dst, sems.at[i])
        cp.start()
        return cp

    @pl.when(jnp.logical_and(jnp.logical_and(ts == 0, p == 0), b == 0))
    def _():
        for o in (dwir_out, dwiz_out, dwin_out, dwhr_out, dwhz_out,
                  dwhn_out, dbir_out, dbiz_out, dbin_out, dbhr_out,
                  dbhz_out, dbhn_out, dmw_out, dmbias_out, dsw_out,
                  dsb_out):
            o[:] = jnp.zeros_like(o)

    @pl.when(ts < steps)
    def _():
        mean = stats_ref[pl.ds(t * fp, fp), 0:1]
        var = stats_ref[pl.ds(t * fp, fp), 1:2]
        s = jnp.sqrt(jnp.maximum(var, VAR_CLAMP))
        d = s + BN_EPS

        @pl.when(p == 0)
        def _():
            @pl.when(b == 0)
            def _():
                accS[:] = jnp.zeros_like(accS)
            cps = [_load(htil_hbm.at[pl.ds(t * fp, fp), pl.ds(off, blk)],
                         hblk, 0),
                   _load(mask_hbm.at[:, pl.ds(off, blk)], mblk, 1),
                   _load(gh_hbm.at[:, pl.ds(off, blk)], ghblk, 2)]
            for cp in cps:
                cp.wait()
            m = mblk[:]
            xhat = (hblk[:] - mean) * m / d
            gym = ghblk[:] * m
            dsw_out[:] += jnp.sum(gym * xhat, axis=1, keepdims=True)
            dsb_out[:] += jnp.sum(gym, axis=1, keepdims=True)
            dxhat = gym * sw_ref[:]
            accS[:, 0:1] += jnp.sum(dxhat, axis=1, keepdims=True)
            accS[:, 1:2] += jnp.sum(dxhat * xhat, axis=1, keepdims=True)

        @pl.when(p == 1)
        def _():
            @pl.when(t == 1)
            def _():
                _load(h0_hbm.at[:, pl.ds(off, blk)], sblk, 0).wait()

            @pl.when(t > 1)
            def _():
                _load(hs_hbm.at[pl.ds((t - 2) * fp, fp), pl.ds(off, blk)],
                      sblk, 0).wait()

            @pl.when(ts == 0)
            def _():
                dmbblk[:] = jnp.zeros_like(dmbblk)

            @pl.when(ts > 0)
            def _():
                _load(dmb_hbm.at[:, pl.ds(off, blk)], dmbblk, 1).wait()
            cps = [_load(gates_hbm.at[:, pl.ds(off, blk)], gblk, 1),
                   _load(mask_hbm.at[:, pl.ds(off, blk)], mblk, 2),
                   _load(gh_hbm.at[:, pl.ds(off, blk)], ghblk, 3),
                   _load(htil_hbm.at[pl.ds(t * fp, fp), pl.ds(off, blk)],
                         hblk, 4),
                   _load(htil_hbm.at[pl.ds(0, fp), pl.ds(off, blk)],
                         mbblk, 5)]
            for cp in cps:
                cp.wait()
            m = mblk[:]
            # masked-BN input gradient (closed form, forward's own stats)
            xhat = (hblk[:] - mean) * m / d
            gym = ghblk[:] * m
            dxhat = gym * sw_ref[:]
            S1 = accS[:, 0:1]
            S2 = accS[:, 1:2]
            dhtil = (dxhat - m * S1 / c) / d - m * xhat * S2 / (c * s)
            dhp = dhtil * m
            # GRU backward (internals recomputed from s_{t-1} + gates)
            hprev = sblk[:]
            gr = gblk[0 * fp:1 * fp, :]
            gz = gblk[1 * fp:2 * fp, :]
            gn = gblk[2 * fp:3 * fp, :]
            whr = whr_ref[:]
            whz = whz_ref[:]
            whn = whn_ref[:]
            rh = _dot(whr.T, hprev) + bhr_ref[:]
            zh = _dot(whz.T, hprev) + bhz_ref[:]
            nh = _dot(whn.T, hprev) + bhn_ref[:]
            sr = jax.nn.sigmoid(gr + rh)
            sz = jax.nn.sigmoid(gz + zh)
            z = sz * m
            tn = jnp.tanh(gn + (sr * m) * nh)
            n_ = tn * m
            dz = dhp * (hprev - n_)
            dn = dhp * (1.0 - z)
            da_n = dn * m * (1.0 - tn * tn)
            dr = da_n * nh
            dnh = da_n * (sr * m)
            da_r = dr * m * sr * (1.0 - sr)
            da_z = dz * m * sz * (1.0 - sz)
            gh_new = dhp * z + _dot(whr, da_r) + _dot(whz, da_z) \
                + _dot(whn, dnh)
            # t == 1 ends the walk: gh becomes dh0 (mask like the monolith)
            lastmul = jnp.where(t == 1, m, jnp.ones_like(m))
            ghblk[:] = gh_new * lastmul
            dwhr_out[:] += _dot(hprev, da_r.T)
            dwhz_out[:] += _dot(hprev, da_z.T)
            dwhn_out[:] += _dot(hprev, dnh.T)
            dbhr_out[:] += jnp.sum(da_r, axis=1, keepdims=True)
            dbhz_out[:] += jnp.sum(da_z, axis=1, keepdims=True)
            dbhn_out[:] += jnp.sum(dnh, axis=1, keepdims=True)
            # mb (the BN'd messages) recomputed from htil slot 0 + ma stats
            ma_mean = stats_ref[0:fp, 0:1]
            ma_var = stats_ref[0:fp, 1:2]
            ma_d = jnp.sqrt(jnp.maximum(ma_var, VAR_CLAMP)) + BN_EPS
            xhat_m = (mbblk[:] - ma_mean) * m / ma_d
            mb = (mw_ref[:] * xhat_m + mbias_ref[:]) * m
            dwir_out[:] += _dot(mb, da_r.T)
            dwiz_out[:] += _dot(mb, da_z.T)
            dwin_out[:] += _dot(mb, da_n.T)
            dbir_out[:] += jnp.sum(da_r, axis=1, keepdims=True)
            dbiz_out[:] += jnp.sum(da_z, axis=1, keepdims=True)
            dbin_out[:] += jnp.sum(da_n, axis=1, keepdims=True)
            dmbblk[:] += _dot(wir_ref[:], da_r) + _dot(wiz_ref[:], da_z) \
                + _dot(win_ref[:], da_n)
            wb1 = pltpu.make_async_copy(
                ghblk, gh_hbm.at[:, pl.ds(off, blk)], sems.at[0])
            wb2 = pltpu.make_async_copy(
                dmbblk, dmb_hbm.at[:, pl.ds(off, blk)], sems.at[1])
            wb1.start()
            wb2.start()
            wb1.wait()
            wb2.wait()

    @pl.when(ts == steps)
    def _():
        # masked-BN backward of ma_bn over msgs with cotangent dmb
        mean = stats_ref[0:fp, 0:1]
        var = stats_ref[0:fp, 1:2]
        s = jnp.sqrt(jnp.maximum(var, VAR_CLAMP))
        d = s + BN_EPS
        cps = [_load(htil_hbm.at[pl.ds(0, fp), pl.ds(off, blk)], mbblk, 0),
               _load(mask_hbm.at[:, pl.ds(off, blk)], mblk, 1),
               _load(dmb_hbm.at[:, pl.ds(off, blk)], dmbblk, 2)]
        for cp in cps:
            cp.wait()
        m = mblk[:]
        xhat = (mbblk[:] - mean) * m / d
        gym = dmbblk[:] * m
        dxhat = gym * mw_ref[:]

        @pl.when(p == 0)
        def _():
            @pl.when(b == 0)
            def _():
                accS[:] = jnp.zeros_like(accS)
            dmw_out[:] += jnp.sum(gym * xhat, axis=1, keepdims=True)
            dmbias_out[:] += jnp.sum(gym, axis=1, keepdims=True)
            accS[:, 0:1] += jnp.sum(dxhat, axis=1, keepdims=True)
            accS[:, 1:2] += jnp.sum(dxhat * xhat, axis=1, keepdims=True)

        @pl.when(p == 1)
        def _():
            S1 = accS[:, 0:1]
            S2 = accS[:, 1:2]
            dmsgs = ((dxhat - m * S1 / c) / d
                     - m * xhat * S2 / (c * s)) * m
            mbblk[:] = dmsgs
            wb = pltpu.make_async_copy(
                mbblk, dmsgs_hbm.at[:, pl.ds(off, blk)], sems.at[0])
            wb.start()
            wb.wait()


def _blocked_backward_call(res, g_ht, *, steps, f, n, blk, interpret):
    """Run the blocked backward kernel; returns (dmsgs, dh0, dgru, dma, dbn)
    with gradients in the caller's (N, f) layout."""
    (msgs, h0, mask, gru, ma_bn, bn, gates, htil, h_all, stats) = res
    fp = _round_up(f, 16)
    npad = _round_up(n, blk)
    nb = npad // blk
    dt = jnp.float32

    def _vm():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    def _any():
        return pl.BlockSpec(memory_space=pltpu.ANY)

    packed, mat_t = _pack_blocked(msgs, h0, mask, gru, ma_bn, bn,
                                  f=f, fp=fp, n=n, npad=npad)
    (msgs_t, h0m, mask_row, c,
     wir, wiz, win, whr, whz, whn, _bir, _biz, _bin, bhr, bhz, bhn,
     mw, mbias, sw, _sb) = packed
    g_t = mat_t(g_ht)

    kernel = functools.partial(_blocked_bwd_kernel, steps=steps, fp=fp,
                               blk=blk)
    fpn = jax.ShapeDtypeStruct((fp, npad), dt)
    fpf = jax.ShapeDtypeStruct((fp, fp), dt)
    fc = jax.ShapeDtypeStruct((fp, 1), dt)
    outs = pl.pallas_call(
        kernel,
        grid=(steps + 1, 2, nb),
        in_specs=[_any()] * 5 + [pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [_vm()] * 13 + [_any()],
        out_specs=tuple([_any()] * 3 + [_vm()] * 16),
        out_shape=(fpn, fpn, fpn,
                   fpf, fpf, fpf, fpf, fpf, fpf,
                   fc, fc, fc, fc, fc, fc, fc, fc, fc, fc),
        input_output_aliases={19: 0},
        scratch_shapes=[
            pltpu.VMEM((fp, blk), dt),          # sblk (s_{t-1})
            pltpu.VMEM((3 * fp, blk), dt),      # gblk (gates)
            pltpu.VMEM((1, blk), dt),           # mblk
            pltpu.VMEM((fp, blk), dt),          # ghblk (cotangent)
            pltpu.VMEM((fp, blk), dt),          # hblk (htil slot t)
            pltpu.VMEM((fp, blk), dt),          # mbblk (htil slot 0)
            pltpu.VMEM((fp, blk), dt),          # dmbblk
            pltpu.VMEM((fp, 2), dt),            # accS (S1, S2)
            pltpu.SemaphoreType.DMA((6,)),
        ],
        interpret=interpret,
    )(h0m, h_all, htil, gates, mask_row, c,
      wir, wiz, win, whr, whz, whn, bhr, bhz, bhn, mw, mbias, sw,
      stats, g_t)
    (dh0_t, _dmb, dmsgs_t, dwir, dwiz, dwin, dwhr, dwhz, dwhn,
     dbir, dbiz, dbin_, dbhr, dbhz, dbhn, dmw, dmbb, dsw, dsb) = outs

    def unblocks(ws):
        return jnp.stack([w[:f, :f] for w in ws], axis=1).reshape(f, 3 * f)

    def uncol3(cs):
        return jnp.concatenate([cv[:f, 0] for cv in cs])

    dgru = {
        "w_ih": unblocks([dwir, dwiz, dwin]).astype(gru["w_ih"].dtype),
        "w_hh": unblocks([dwhr, dwhz, dwhn]).astype(gru["w_hh"].dtype),
        "b_ih": uncol3([dbir, dbiz, dbin_]).astype(gru["b_ih"].dtype),
        "b_hh": uncol3([dbhr, dbhz, dbhn]).astype(gru["b_hh"].dtype),
    }
    dma = {"weight": dmw[:f, 0].astype(ma_bn["weight"].dtype),
           "bias": dmbb[:f, 0].astype(ma_bn["bias"].dtype)}
    dbn = {"weight": dsw[:f, 0].astype(bn["weight"].dtype),
           "bias": dsb[:f, 0].astype(bn["bias"].dtype)}
    return (dmsgs_t[:f, :n].T.astype(msgs.dtype),
            dh0_t[:f, :n].T.astype(h0.dtype), dgru, dma, dbn)


def make_recurrence_op_blocked(steps: int, f: int, n: int, *,
                               blk: int = 8192, interpret: bool = False,
                               bwd_mode: str = "fused"):
    """Blocked-streaming variant of make_recurrence_op for LARGE node
    counts: Pallas streaming forward + (default) Pallas streaming reverse
    walk over the same node blocks. bwd_mode='xla' keeps the XLA VJP of the
    pure reference (exact same math, many small ops) as a fallback."""

    @jax.custom_vjp
    def op(msgs, h0, mask, gru, ma_bn, bn):
        out, _ = _blocked_forward_call(msgs, h0, mask, gru, ma_bn, bn,
                                       steps=steps, f=f, n=n, blk=blk,
                                       interpret=interpret)
        return out

    def fwd(msgs, h0, mask, gru, ma_bn, bn):
        out, extras = _blocked_forward_call(msgs, h0, mask, gru, ma_bn, bn,
                                            steps=steps, f=f, n=n, blk=blk,
                                            interpret=interpret)
        if bwd_mode == "xla":
            return out, (msgs, h0, mask, gru, ma_bn, bn)
        gates, htil, h_all, stats = extras
        return out, (msgs, h0, mask, gru, ma_bn, bn,
                     gates, htil, h_all, stats)

    def bwd(res, cot):
        if bwd_mode == "xla":
            msgs, h0, mask, gru, ma_bn, bn = res
            _, vjp = jax.vjp(
                lambda m_, h_, g_, a_, b_: reference_recurrence(
                    m_, h_, mask, g_, a_, b_, steps=steps),
                msgs, h0, gru, ma_bn, bn)
            dm, dh, dg, da_, db_ = vjp(cot)
            return dm, dh, None, dg, da_, db_
        g_ht, _, _ = cot          # stats feed running-state EMAs (no grad)
        dm, dh, dg, da_, db_ = _blocked_backward_call(
            res, g_ht, steps=steps, f=f, n=n, blk=blk, interpret=interpret)
        return dm, dh, None, dg, da_, db_

    op.defvjp(fwd, bwd)
    return op


# ---------------------------------------------------------------------------
# MERGED-PASS streaming recurrence: grid (T+2, node-blocks), fwd AND bwd
# ---------------------------------------------------------------------------
#
# The blocked variant above spends 2 passes per step (compute+stats, then
# normalize) and stores three per-node HBM buffers (gates 3fp, pre-BN htil,
# post-BN h). This variant folds everything into ONE pass per step by
# recomputing instead of storing:
#   * the BN normalize of state t-1 happens INLINE at the top of pass t
#     (its stats were accumulated during pass t-1 and are finalized at
#     block 0 of pass t — the grid is sequential);
#   * the GRU input gates are recomputed per pass from htil slot 0 (the
#     masked messages) + the ma stats via three tiny (fp,fp)·(fp,blk) MXU
#     matmuls — MXU time is free at these widths, HBM traffic is not, so
#     trading a 3fp-wide gates buffer for an fp-wide re-read wins;
#   * the post-BN state is never materialized at all — only the LAST state
#     is normalized and written (pass T+1).
# Per-step HBM traffic drops from ~7fp·N (read state+gates+htil, write
# htil+h) to 3fp·N (read htil_{t-1}+htil_0, write htil_t); pass count from
# 2(T+1) to T+2. The BACKWARD applies the same fusion: the reduction pass
# of step t-1 rides inside the apply pass of step t (whose inline
# normalize already has x̂_{t-1} in registers), so it is also T+2 passes.
#
# Residual layout (forward outputs, consumed by the backward):
#   htil_hbm ((T+1)·fp, npad)  slot 0 = masked msgs, slot t = pre-BN state
#   stats    ((T+1)·fp, 2)     slot 0 = ma stats,    slot t = step-t stats
# Variance is single-pass (E[x²]−μ²), like the blocked variant.

def _merged_kernel(msgs_hbm, h0_hbm, mask_hbm, c_ref,
                   wir_ref, wiz_ref, win_ref, whr_ref, whz_ref, whn_ref,
                   bir_ref, biz_ref, bin_ref, bhr_ref, bhz_ref, bhn_ref,
                   mw_ref, mb_ref, sw_ref, sb_ref,
                   htil_hbm, stats_out, hout_hbm,
                   xblk, pblk, mblk, acc, mast, stats, sems,
                   *, steps: int, fp: int, blk: int):
    t = pl.program_id(0)                 # 0..steps+1
    b = pl.program_id(1)
    off = b * blk
    c = c_ref[0, 0]

    def _load(src, dst, i):
        cp = pltpu.make_async_copy(src, dst, sems.at[i])
        cp.start()
        return cp

    @pl.when(jnp.logical_and(t == 0, b == 0))
    def _():
        acc[:] = jnp.zeros_like(acc)

    # finalize stats of htil slot t-1 (accumulated during pass t-1)
    @pl.when(jnp.logical_and(t > 0, b == 0))
    def _():
        mean = acc[:, 0:1] / c
        var = jnp.maximum(acc[:, 1:2] / c - mean * mean, 0.0)

        @pl.when(t == 1)
        def _():
            mast[:, 0:1] = mean
            mast[:, 1:2] = var

        @pl.when(t > 1)
        def _():
            stats[:, 0:1] = mean
            stats[:, 1:2] = var
        stats_out[pl.ds((t - 1) * fp, fp), 0:1] = mean
        stats_out[pl.ds((t - 1) * fp, fp), 1:2] = var
        acc[:] = jnp.zeros_like(acc)

    cpm = _load(mask_hbm.at[:, pl.ds(off, blk)], mblk, 0)

    @pl.when(t == 0)
    def _():
        _load(msgs_hbm.at[:, pl.ds(off, blk)], xblk, 1).wait()
        cpm.wait()
        x = xblk[:] * mblk[:]
        xblk[:] = x
        wb = pltpu.make_async_copy(
            xblk, htil_hbm.at[pl.ds(0, fp), pl.ds(off, blk)], sems.at[1])
        wb.start()
        acc[:, 0:1] += jnp.sum(x, axis=1, keepdims=True)
        acc[:, 1:2] += jnp.sum(x * x, axis=1, keepdims=True)
        wb.wait()

    @pl.when(jnp.logical_and(t >= 1, t <= steps))
    def _():
        cpp = _load(htil_hbm.at[pl.ds(0, fp), pl.ds(off, blk)], pblk, 1)

        @pl.when(t == 1)
        def _():
            _load(h0_hbm.at[:, pl.ds(off, blk)], xblk, 2).wait()

        @pl.when(t > 1)
        def _():
            _load(htil_hbm.at[pl.ds((t - 1) * fp, fp), pl.ds(off, blk)],
                  xblk, 2).wait()
        cpp.wait()
        cpm.wait()
        m = mblk[:]
        # mb + input gates recomputed from htil slot 0 (masked msgs)
        ma_d = jnp.sqrt(jnp.maximum(mast[:, 1:2], VAR_CLAMP)) + BN_EPS
        xhat0 = (pblk[:] - mast[:, 0:1]) * m / ma_d
        mbv = (mw_ref[:] * xhat0 + mb_ref[:]) * m
        gr = _dot(wir_ref[:].T, mbv) + bir_ref[:]
        gz = _dot(wiz_ref[:].T, mbv) + biz_ref[:]
        gn = _dot(win_ref[:].T, mbv) + bin_ref[:]
        # previous state: h0 (pre-masked) for step 1, inline-normalized
        # htil_{t-1} after
        @pl.when(t > 1)
        def _():
            s = jnp.sqrt(jnp.maximum(stats[:, 1:2], VAR_CLAMP)) + BN_EPS
            xhat = (xblk[:] - stats[:, 0:1]) * m / s
            xblk[:] = (sw_ref[:] * xhat + sb_ref[:]) * m
        h = xblk[:]
        htil = _gru_fwd_t(h, gr, gz, gn, whr_ref[:], whz_ref[:],
                          whn_ref[:], bhr_ref[:], bhz_ref[:], bhn_ref[:],
                          m)
        xblk[:] = htil
        wb = pltpu.make_async_copy(
            xblk, htil_hbm.at[pl.ds(t * fp, fp), pl.ds(off, blk)],
            sems.at[1])
        wb.start()
        acc[:, 0:1] += jnp.sum(htil, axis=1, keepdims=True)
        acc[:, 1:2] += jnp.sum(htil * htil, axis=1, keepdims=True)
        wb.wait()

    @pl.when(t == steps + 1)
    def _():
        _load(htil_hbm.at[pl.ds(steps * fp, fp), pl.ds(off, blk)],
              xblk, 1).wait()
        cpm.wait()
        m = mblk[:]
        s = jnp.sqrt(jnp.maximum(stats[:, 1:2], VAR_CLAMP)) + BN_EPS
        xhat = (xblk[:] - stats[:, 0:1]) * m / s
        xblk[:] = (sw_ref[:] * xhat + sb_ref[:]) * m
        wb = pltpu.make_async_copy(
            xblk, hout_hbm.at[:, pl.ds(off, blk)], sems.at[1])
        wb.start()
        wb.wait()


def _merged_forward_call(msgs, h0, mask, gru, ma_bn, bn, *, steps, f, n,
                         blk, interpret):
    fp = _round_up(f, 16)
    npad = _round_up(n, blk)
    nb = npad // blk
    dt = jnp.float32

    def _vm():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    def _any():
        return pl.BlockSpec(memory_space=pltpu.ANY)

    kernel = functools.partial(_merged_kernel, steps=steps, fp=fp, blk=blk)
    args, _ = _pack_blocked(msgs, h0, mask, gru, ma_bn, bn,
                            f=f, fp=fp, n=n, npad=npad)
    htil, stats, hout = pl.pallas_call(
        kernel,
        grid=(steps + 2, nb),
        in_specs=[_any(), _any(), _any(),
                  pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [_vm()] * 16,
        out_specs=(_any(), _vm(), _any()),
        out_shape=(
            jax.ShapeDtypeStruct(((steps + 1) * fp, npad), dt),
            jax.ShapeDtypeStruct(((steps + 1) * fp, 2), dt),
            jax.ShapeDtypeStruct((fp, npad), dt),
        ),
        scratch_shapes=[
            pltpu.VMEM((fp, blk), dt),          # xblk
            pltpu.VMEM((fp, blk), dt),          # pblk (htil slot 0)
            pltpu.VMEM((1, blk), dt),           # mblk
            pltpu.VMEM((fp, 2), dt),            # acc
            pltpu.VMEM((fp, 2), dt),            # mast (ma stats)
            pltpu.VMEM((fp, 2), dt),            # stats (current step)
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(*args)
    odt = msgs.dtype
    ma_stats = (stats[0:f, 0].astype(odt), stats[0:f, 1].astype(odt))
    step_stats = [(stats[t * fp:t * fp + f, 0].astype(odt),
                   stats[t * fp:t * fp + f, 1].astype(odt))
                  for t in range(1, steps + 1)]
    return ((hout[:f, :n].T.astype(odt), ma_stats, step_stats),
            (htil, stats))


def _merged_bwd_kernel(h0_hbm, htil_hbm, mask_hbm, c_ref,
                       wir_ref, wiz_ref, win_ref, whr_ref, whz_ref,
                       whn_ref, bir_ref, biz_ref, bin_ref,
                       bhr_ref, bhz_ref, bhn_ref,
                       mw_ref, mbias_ref, sw_ref, sb_ref, stats_ref, g_in,
                       _dmbz_in, _dmsgsz_in,
                       gh_hbm, dmb_hbm, dmsgs_hbm,
                       dwir_out, dwiz_out, dwin_out,
                       dwhr_out, dwhz_out, dwhn_out,
                       dbir_out, dbiz_out, dbin_out,
                       dbhr_out, dbhz_out, dbhn_out,
                       dmw_out, dmbias_out, dsw_out, dsb_out,
                       sblk, pblk, mblk, ghblk, hblk, dmbblk,
                       accC, accN, sems,
                       *, steps: int, fp: int, blk: int):
    ts = pl.program_id(0)               # 0..steps+1
    b = pl.program_id(1)
    t = steps - ts + 1                  # step applied in passes 1..steps
    off = b * blk
    c = c_ref[0, 0]

    def _load(src, dst, i):
        cp = pltpu.make_async_copy(src, dst, sems.at[i])
        cp.start()
        return cp

    @pl.when(jnp.logical_and(ts == 0, b == 0))
    def _():
        for o in (dwir_out, dwiz_out, dwin_out, dwhr_out, dwhz_out,
                  dwhn_out, dbir_out, dbiz_out, dbin_out, dbhr_out,
                  dbhz_out, dbhn_out, dmw_out, dmbias_out, dsw_out,
                  dsb_out):
            o[:] = jnp.zeros_like(o)
        accN[:] = jnp.zeros_like(accN)

    # S1/S2 for this pass's BN-apply were accumulated during the previous
    # pass; promote them (sequential grid)
    @pl.when(jnp.logical_and(ts > 0, b == 0))
    def _():
        accC[:] = accN[:]
        accN[:] = jnp.zeros_like(accN)

    cpm = _load(mask_hbm.at[:, pl.ds(off, blk)], mblk, 0)

    @pl.when(ts == 0)
    def _():
        # reduction for step T (the one pass with no apply to fuse into)
        cph = _load(htil_hbm.at[pl.ds(steps * fp, fp), pl.ds(off, blk)],
                    hblk, 1)
        cpg = _load(gh_hbm.at[:, pl.ds(off, blk)], ghblk, 2)
        cph.wait()
        cpg.wait()
        cpm.wait()
        m = mblk[:]
        mean = stats_ref[pl.ds(steps * fp, fp), 0:1]
        var = stats_ref[pl.ds(steps * fp, fp), 1:2]
        d = jnp.sqrt(jnp.maximum(var, VAR_CLAMP)) + BN_EPS
        xhat = (hblk[:] - mean) * m / d
        gym = ghblk[:] * m
        dsw_out[:] += jnp.sum(gym * xhat, axis=1, keepdims=True)
        dsb_out[:] += jnp.sum(gym, axis=1, keepdims=True)
        dxhat = gym * sw_ref[:]
        accN[:, 0:1] += jnp.sum(dxhat, axis=1, keepdims=True)
        accN[:, 1:2] += jnp.sum(dxhat * xhat, axis=1, keepdims=True)

    @pl.when(jnp.logical_and(ts >= 1, ts <= steps))
    def _():
        # apply of step t (= steps-ts+1), fused with the reduction of step
        # t-1 (t ≥ 2) or of ma_bn (t == 1)
        cps = [_load(htil_hbm.at[pl.ds(t * fp, fp), pl.ds(off, blk)],
                     hblk, 1),
               _load(htil_hbm.at[pl.ds(0, fp), pl.ds(off, blk)], pblk, 2),
               _load(gh_hbm.at[:, pl.ds(off, blk)], ghblk, 3)]

        @pl.when(t == 1)
        def _():
            _load(h0_hbm.at[:, pl.ds(off, blk)], sblk, 4).wait()

        @pl.when(t > 1)
        def _():
            _load(htil_hbm.at[pl.ds((t - 1) * fp, fp), pl.ds(off, blk)],
                  sblk, 4).wait()

        @pl.when(ts == 1)
        def _():
            dmbblk[:] = jnp.zeros_like(dmbblk)

        @pl.when(ts > 1)
        def _():
            _load(dmb_hbm.at[:, pl.ds(off, blk)], dmbblk, 5).wait()
        for cp in cps:
            cp.wait()
        cpm.wait()
        m = mblk[:]
        # BN backward of step t (closed form, accC = this step's S1/S2)
        mean = stats_ref[pl.ds(t * fp, fp), 0:1]
        var = stats_ref[pl.ds(t * fp, fp), 1:2]
        s = jnp.sqrt(jnp.maximum(var, VAR_CLAMP))
        d = s + BN_EPS
        xhat_t = (hblk[:] - mean) * m / d
        gym = ghblk[:] * m
        dxhat = gym * sw_ref[:]
        S1 = accC[:, 0:1]
        S2 = accC[:, 1:2]
        dhtil = (dxhat - m * S1 / c) / d - m * xhat_t * S2 / (c * s)
        dhp = dhtil * m
        # previous state + its x̂ (inline normalize for t ≥ 2)
        ma_mean = stats_ref[0:fp, 0:1]
        ma_var = stats_ref[0:fp, 1:2]
        ma_d = jnp.sqrt(jnp.maximum(ma_var, VAR_CLAMP)) + BN_EPS
        xhat0 = (pblk[:] - ma_mean) * m / ma_d
        mb = (mw_ref[:] * xhat0 + mbias_ref[:]) * m

        @pl.when(t > 1)
        def _():
            pmean = stats_ref[pl.ds((t - 1) * fp, fp), 0:1]
            pvar = stats_ref[pl.ds((t - 1) * fp, fp), 1:2]
            pd = jnp.sqrt(jnp.maximum(pvar, VAR_CLAMP)) + BN_EPS
            xh = (sblk[:] - pmean) * m / pd
            # stash x̂_{t-1} for the fused reduction; sblk becomes s_{t-1}
            hblk[:] = xh
            sblk[:] = (sw_ref[:] * xh + sb_ref[:]) * m
        hprev = sblk[:]
        # GRU backward (internals recomputed from s_{t-1} + inline gates)
        gr = _dot(wir_ref[:].T, mb) + bir_ref[:]
        gz = _dot(wiz_ref[:].T, mb) + biz_ref[:]
        gn = _dot(win_ref[:].T, mb) + bin_ref[:]
        whr = whr_ref[:]
        whz = whz_ref[:]
        whn = whn_ref[:]
        rh = _dot(whr.T, hprev) + bhr_ref[:]
        zh = _dot(whz.T, hprev) + bhz_ref[:]
        nh = _dot(whn.T, hprev) + bhn_ref[:]
        sr = jax.nn.sigmoid(gr + rh)
        sz = jax.nn.sigmoid(gz + zh)
        z = sz * m
        tn = jnp.tanh(gn + (sr * m) * nh)
        n_ = tn * m
        dz = dhp * (hprev - n_)
        dn = dhp * (1.0 - z)
        da_n = dn * m * (1.0 - tn * tn)
        dr = da_n * nh
        dnh = da_n * (sr * m)
        da_r = dr * m * sr * (1.0 - sr)
        da_z = dz * m * sz * (1.0 - sz)
        gh_new = dhp * z + _dot(whr, da_r) + _dot(whz, da_z) \
            + _dot(whn, dnh)
        dwhr_out[:] += _dot(hprev, da_r.T)
        dwhz_out[:] += _dot(hprev, da_z.T)
        dwhn_out[:] += _dot(hprev, dnh.T)
        dbhr_out[:] += jnp.sum(da_r, axis=1, keepdims=True)
        dbhz_out[:] += jnp.sum(da_z, axis=1, keepdims=True)
        dbhn_out[:] += jnp.sum(dnh, axis=1, keepdims=True)
        dwir_out[:] += _dot(mb, da_r.T)
        dwiz_out[:] += _dot(mb, da_z.T)
        dwin_out[:] += _dot(mb, da_n.T)
        dbir_out[:] += jnp.sum(da_r, axis=1, keepdims=True)
        dbiz_out[:] += jnp.sum(da_z, axis=1, keepdims=True)
        dbin_out[:] += jnp.sum(da_n, axis=1, keepdims=True)
        dmbblk[:] += _dot(wir_ref[:], da_r) + _dot(wiz_ref[:], da_z) \
            + _dot(win_ref[:], da_n)

        @pl.when(t > 1)
        def _():
            # fused reduction for step t-1 (x̂_{t-1} stashed in hblk)
            gym2 = gh_new * m
            dsw_out[:] += jnp.sum(gym2 * hblk[:], axis=1, keepdims=True)
            dsb_out[:] += jnp.sum(gym2, axis=1, keepdims=True)
            dx2 = gym2 * sw_ref[:]
            accN[:, 0:1] += jnp.sum(dx2, axis=1, keepdims=True)
            accN[:, 1:2] += jnp.sum(dx2 * hblk[:], axis=1, keepdims=True)
            ghblk[:] = gh_new

        @pl.when(t == 1)
        def _():
            # walk done: gh becomes dh0; fused reduction for ma_bn (dmb is
            # complete for this block)
            ghblk[:] = gh_new * m
            gym_m = dmbblk[:] * m
            dmw_out[:] += jnp.sum(gym_m * xhat0, axis=1, keepdims=True)
            dmbias_out[:] += jnp.sum(gym_m, axis=1, keepdims=True)
            dxm = gym_m * mw_ref[:]
            accN[:, 0:1] += jnp.sum(dxm, axis=1, keepdims=True)
            accN[:, 1:2] += jnp.sum(dxm * xhat0, axis=1, keepdims=True)
        wb1 = pltpu.make_async_copy(
            ghblk, gh_hbm.at[:, pl.ds(off, blk)], sems.at[0])
        wb2 = pltpu.make_async_copy(
            dmbblk, dmb_hbm.at[:, pl.ds(off, blk)], sems.at[1])
        wb1.start()
        wb2.start()
        wb1.wait()
        wb2.wait()

    @pl.when(ts == steps + 1)
    def _():
        # ma_bn input-gradient apply → dmsgs
        cps = [_load(htil_hbm.at[pl.ds(0, fp), pl.ds(off, blk)], pblk, 1),
               _load(dmb_hbm.at[:, pl.ds(off, blk)], dmbblk, 2)]
        for cp in cps:
            cp.wait()
        cpm.wait()
        m = mblk[:]
        mean = stats_ref[0:fp, 0:1]
        var = stats_ref[0:fp, 1:2]
        s = jnp.sqrt(jnp.maximum(var, VAR_CLAMP))
        d = s + BN_EPS
        xhat = (pblk[:] - mean) * m / d
        gym = dmbblk[:] * m
        dxhat = gym * mw_ref[:]
        S1 = accC[:, 0:1]
        S2 = accC[:, 1:2]
        pblk[:] = ((dxhat - m * S1 / c) / d
                   - m * xhat * S2 / (c * s)) * m
        wb = pltpu.make_async_copy(
            pblk, dmsgs_hbm.at[:, pl.ds(off, blk)], sems.at[0])
        wb.start()
        wb.wait()


# ---------------------------------------------------------------------------
# VMEM-resident backward: at bench-scale node counts the WHOLE residual set
# (htil slots + stats + cotangent) fits VMEM once the per-kernel limit is
# raised, so the reverse walk is ONE grid step with direct reads — no
# passes, no DMA choreography, no per-pass gh/dmb HBM round-trips, and the
# step-constant mb + input gates hoisted out of the loop (the streaming
# variant recomputes them every pass to bound its block VMEM).
# Same math as _merged_bwd_kernel; consumes the same merged-layout
# residuals (htil slot 0 = masked msgs, slot t = pre-BN state; stats rows).
# ---------------------------------------------------------------------------

# live (fp, npad) panels in the unrolled reverse walk (measured headroom
# multiplier for the VMEM estimate; the htil input adds steps+1 more)
_VMEM_BWD_LIVE_PANELS = 26


def _vmem_bwd_fits(steps: int, f: int, npad: int) -> bool:
    fp = _round_up(f, 16)
    est = (steps + 1 + _VMEM_BWD_LIVE_PANELS) * fp * npad * 4
    return est <= 96 * 2 ** 20


def vmem_reverse_walk(h0, htil_ref, stats_ref, m, c,
                      wir, wiz, win, whr, whz, whn,
                      bir, biz, bin_c, bhr, bhz, bhn,
                      mw, mbias, sw, sb, gh0, *, steps: int, fp: int,
                      msg_norm: str = "bn1d", state_norm: str = "bn1d"):
    """The VMEM-resident reverse walk as a VALUE-level function (refs only
    for the sliced htil/stats residuals), shared by _vmem_bwd_kernel and
    the fused-step combined readout+recurrence backward
    (kernels/fused_step.py). Returns
    (dh0, dmsgs, (dwir, dwiz, dwin, dwhr, dwhz, dwhn),
     (dbr, dbz, dbn, dbnh), (dmw, dmbias, dsw, dsb)).

    msg_norm/state_norm branches are STATIC (Python-level): the bn1d/bn1d
    flagship path compiles to exactly the round-3 kernel; 'stateless'
    swaps the denominators (_norm_denoms) and drops the affine;
    'none' short-circuits the norm entirely (dhtil = gh, hprev = htil)."""

    def srow(t):
        return (stats_ref[t * fp:(t + 1) * fp, 0:1],
                stats_ref[t * fp:(t + 1) * fp, 1:2])

    zc0 = jnp.zeros((fp, 1), h0.dtype)
    # hoisted step constants: mb from htil slot 0 + the three input gates
    if msg_norm == "bn1d":
        ma_mean, ma_var = srow(0)
        ma_s = jnp.sqrt(jnp.maximum(ma_var, VAR_CLAMP))
        ma_d = ma_s + BN_EPS
        xhat0 = (htil_ref[0:fp, :] - ma_mean) * m / ma_d
        mb = (mw * xhat0 + mbias) * m
    else:
        mb = htil_ref[0:fp, :]          # slot 0 = masked msgs, no norm
    gr = _dot(wir.T, mb) + bir
    gz = _dot(wiz.T, mb) + biz
    gn = _dot(win.T, mb) + bin_c

    # step-T norm reduction (the final state's normalize)
    gym = gh0 * m
    if state_norm == "none":
        dsw = dsb = zc0
        dxhat = xhat_t = S1 = S2 = None
    else:
        mean_T, var_T = srow(steps)
        _s_T, d_T = _norm_denoms(var_T, state_norm)
        xhat_t = (htil_ref[steps * fp:(steps + 1) * fp, :] - mean_T) \
            * m / d_T
        if state_norm == "bn1d":
            dsw = jnp.sum(gym * xhat_t, axis=1, keepdims=True)
            dsb = jnp.sum(gym, axis=1, keepdims=True)
            dxhat = gym * sw
        else:
            dsw = dsb = zc0
            dxhat = gym
        S1 = jnp.sum(dxhat, axis=1, keepdims=True)
        S2 = jnp.sum(dxhat * xhat_t, axis=1, keepdims=True)

    zf = jnp.zeros((fp, fp), mb.dtype)
    zc = jnp.zeros((fp, 1), mb.dtype)
    dwir_a = dwiz_a = dwin_a = dwhr_a = dwhz_a = dwhn_a = zf
    dbr = dbz = dbn_ = dbnh = zc
    dmb_acc = jnp.zeros_like(mb)
    dh0 = dmsgs = None
    dmw_o = dmbias_o = None
    gh = gym                            # state_norm 'none': dhtil = gh

    for t in range(steps, 0, -1):
        if state_norm == "none":
            dhtil = gh
        else:
            _, var_t = srow(t)
            s_t, d_t = _norm_denoms(var_t, state_norm)
            dhtil = (dxhat - m * S1 / c) / d_t \
                - m * xhat_t * S2 / (c * s_t)
        dhp = dhtil * m
        if t > 1:
            if state_norm == "none":
                hprev = htil_ref[(t - 1) * fp:t * fp, :]
                xh_prev = None
            else:
                pmean, pvar = srow(t - 1)
                _ps, pd = _norm_denoms(pvar, state_norm)
                xh_prev = (htil_ref[(t - 1) * fp:t * fp, :] - pmean) \
                    * m / pd
                hprev = (sw * xh_prev + sb) * m \
                    if state_norm == "bn1d" else xh_prev
        else:
            hprev = h0
        rh = _dot(whr.T, hprev) + bhr
        zh = _dot(whz.T, hprev) + bhz
        nh = _dot(whn.T, hprev) + bhn
        sr = jax.nn.sigmoid(gr + rh)
        sz = jax.nn.sigmoid(gz + zh)
        z = sz * m
        tn = jnp.tanh(gn + (sr * m) * nh)
        n_ = tn * m
        dz = dhp * (hprev - n_)
        dn = dhp * (1.0 - z)
        da_n = dn * m * (1.0 - tn * tn)
        dr = da_n * nh
        dnh = da_n * (sr * m)
        da_r = dr * m * sr * (1.0 - sr)
        da_z = dz * m * sz * (1.0 - sz)
        gh_new = dhp * z + _dot(whr, da_r) + _dot(whz, da_z) \
            + _dot(whn, dnh)
        dwhr_a += _dot(hprev, da_r.T)
        dwhz_a += _dot(hprev, da_z.T)
        dwhn_a += _dot(hprev, dnh.T)
        dwir_a += _dot(mb, da_r.T)
        dwiz_a += _dot(mb, da_z.T)
        dwin_a += _dot(mb, da_n.T)
        dbr += jnp.sum(da_r, axis=1, keepdims=True)
        dbz += jnp.sum(da_z, axis=1, keepdims=True)
        dbn_ += jnp.sum(da_n, axis=1, keepdims=True)
        dbnh += jnp.sum(dnh, axis=1, keepdims=True)
        dmb_acc += _dot(wir, da_r) + _dot(wiz, da_z) + _dot(win, da_n)
        if t > 1:
            gym2 = gh_new * m
            if state_norm == "none":
                gh = gym2
            else:
                if state_norm == "bn1d":
                    dsw += jnp.sum(gym2 * xh_prev, axis=1, keepdims=True)
                    dsb += jnp.sum(gym2, axis=1, keepdims=True)
                    dxhat = gym2 * sw
                else:
                    dxhat = gym2
                S1 = jnp.sum(dxhat, axis=1, keepdims=True)
                S2 = jnp.sum(dxhat * xh_prev, axis=1, keepdims=True)
                xhat_t = xh_prev
        else:
            dh0 = gh_new * m
            gym_m = dmb_acc * m
            if msg_norm == "bn1d":
                dmw_o = jnp.sum(gym_m * xhat0, axis=1, keepdims=True)
                dmbias_o = jnp.sum(gym_m, axis=1, keepdims=True)
                dxm = gym_m * mw
                S1m = jnp.sum(dxm, axis=1, keepdims=True)
                S2m = jnp.sum(dxm * xhat0, axis=1, keepdims=True)
                dmsgs = ((dxm - m * S1m / c) / ma_d
                         - m * xhat0 * S2m / (c * ma_s)) * m
            else:
                dmw_o = dmbias_o = zc0
                dmsgs = gym_m
    # r/z gates: da feeds both bias banks; the n gate differs — b_ih's n
    # bias sees da_n, b_hh's sees dnh (the reset gate multiplies nh)
    return (dh0, dmsgs,
            (dwir_a, dwiz_a, dwin_a, dwhr_a, dwhz_a, dwhn_a),
            (dbr, dbz, dbn_, dbnh),
            (dmw_o, dmbias_o, dsw, dsb))


def _vmem_bwd_kernel(h0_ref, htil_ref, mask_ref, c_ref,
                     wir_ref, wiz_ref, win_ref, whr_ref, whz_ref, whn_ref,
                     bir_ref, biz_ref, bin_ref, bhr_ref, bhz_ref, bhn_ref,
                     mw_ref, mbias_ref, sw_ref, sb_ref, stats_ref, g_ref,
                     dh0_out, dmsgs_out,
                     dwir_out, dwiz_out, dwin_out,
                     dwhr_out, dwhz_out, dwhn_out,
                     dbir_out, dbiz_out, dbin_out,
                     dbhr_out, dbhz_out, dbhn_out,
                     dmw_out, dmbias_out, dsw_out, dsb_out,
                     *, steps: int, fp: int, msg_norm: str = "bn1d",
                     state_norm: str = "bn1d"):
    m = mask_ref[:]
    c = c_ref[0, 0]
    dh0, dmsgs, dws, dbs, dns = vmem_reverse_walk(
        h0_ref[:], htil_ref, stats_ref, m, c,
        wir_ref[:], wiz_ref[:], win_ref[:],
        whr_ref[:], whz_ref[:], whn_ref[:],
        bir_ref[:], biz_ref[:], bin_ref[:],
        bhr_ref[:], bhz_ref[:], bhn_ref[:],
        mw_ref[:], mbias_ref[:], sw_ref[:], sb_ref[:], g_ref[:],
        steps=steps, fp=fp, msg_norm=msg_norm, state_norm=state_norm)
    dh0_out[:] = dh0
    dmsgs_out[:] = dmsgs
    (dwir_out[:], dwiz_out[:], dwin_out[:],
     dwhr_out[:], dwhz_out[:], dwhn_out[:]) = dws
    dbr, dbz, dbn_, dbnh = dbs
    dbir_out[:] = dbr
    dbiz_out[:] = dbz
    dbin_out[:] = dbn_
    dbhr_out[:] = dbr
    dbhz_out[:] = dbz
    dbhn_out[:] = dbnh
    dmw_out[:], dmbias_out[:], dsw_out[:], dsb_out[:] = dns


def _vmem_backward_call(res, g_ht, *, steps, f, n, npad, interpret,
                        transposed_io, msg_norm: str = "bn1d",
                        state_norm: str = "bn1d"):
    (msgs, h0, mask, gru, ma_bn, bn, htil, stats) = res
    fp = _round_up(f, 16)
    dt = jnp.float32
    packed, mat_t = _pack_blocked(msgs, h0, mask, gru, ma_bn, bn,
                                  f=f, fp=fp, n=n, npad=npad)
    (_msgs_t, h0m, mask_row, c,
     wir, wiz, win, whr, whz, whn, bir, biz, bin_c, bhr, bhz, bhn,
     mw, mbias, sw, sb) = packed
    if transposed_io:
        g_t = jnp.pad(g_ht.astype(dt),
                      ((0, fp - g_ht.shape[0]),
                       (0, npad - g_ht.shape[1])))
    else:
        g_t = mat_t(g_ht)

    def _vm():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    kernel = functools.partial(_vmem_bwd_kernel, steps=steps, fp=fp,
                               msg_norm=msg_norm, state_norm=state_norm)
    fpn = jax.ShapeDtypeStruct((fp, npad), dt)
    fpf = jax.ShapeDtypeStruct((fp, fp), dt)
    fc = jax.ShapeDtypeStruct((fp, 1), dt)
    est = (steps + 1 + _VMEM_BWD_LIVE_PANELS) * fp * npad * 4
    outs = pl.pallas_call(
        kernel,
        in_specs=[_vm()] * 22,
        out_specs=tuple([_vm()] * 18),
        out_shape=(fpn, fpn,
                   fpf, fpf, fpf, fpf, fpf, fpf,
                   fc, fc, fc, fc, fc, fc, fc, fc, fc, fc),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(110 * 2 ** 20, est + 8 * 2 ** 20)),
        interpret=interpret,
    )(h0m, htil, mask_row, c,
      wir, wiz, win, whr, whz, whn, bir, biz, bin_c, bhr, bhz, bhn,
      mw, mbias, sw, sb, stats, g_t)
    (dh0_t, dmsgs_t, dwir_o, dwiz_o, dwin_o, dwhr_o, dwhz_o, dwhn_o,
     dbir_o, dbiz_o, dbin_o, dbhr_o, dbhz_o, dbhn_o,
     dmw_o, dmbb_o, dsw_o, dsb_o) = outs

    def unblocks(ws):
        return jnp.stack([w[:f, :f] for w in ws], axis=1).reshape(f, 3 * f)

    def uncol3(cs):
        return jnp.concatenate([cv[:f, 0] for cv in cs])

    dgru = {
        "w_ih": unblocks([dwir_o, dwiz_o, dwin_o]).astype(
            gru["w_ih"].dtype),
        "w_hh": unblocks([dwhr_o, dwhz_o, dwhn_o]).astype(
            gru["w_hh"].dtype),
        "b_ih": uncol3([dbir_o, dbiz_o, dbin_o]).astype(gru["b_ih"].dtype),
        "b_hh": uncol3([dbhr_o, dbhz_o, dbhn_o]).astype(gru["b_hh"].dtype),
    }
    dma = {"weight": dmw_o[:f, 0].astype(ma_bn["weight"].dtype),
           "bias": dmbb_o[:f, 0].astype(ma_bn["bias"].dtype)}
    dbn = {"weight": dsw_o[:f, 0].astype(bn["weight"].dtype),
           "bias": dsb_o[:f, 0].astype(bn["bias"].dtype)}
    if transposed_io:
        return dmsgs_t, dh0_t, dgru, dma, dbn
    return (dmsgs_t[:f, :n].T.astype(msgs.dtype),
            dh0_t[:f, :n].T.astype(h0.dtype), dgru, dma, dbn)


def _merged_backward_call(res, g_ht, *, steps, f, n, blk, interpret,
                          transposed_io=False):
    """transposed_io=True: g_ht comes in the kernel's own (fp, lanes)
    layout (lanes ≤ npad; zero-padded here) and dmsgs/dh0 are returned
    raw as (fp, npad) — callers that chain into other transposed-layout
    kernels (kernels/fused_step.py) skip four HBM transpose round-trips."""
    (msgs, h0, mask, gru, ma_bn, bn, htil, stats) = res
    fp = _round_up(f, 16)
    npad = _round_up(n, blk)
    nb = npad // blk
    dt = jnp.float32

    def _vm():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    def _any():
        return pl.BlockSpec(memory_space=pltpu.ANY)

    packed, mat_t = _pack_blocked(msgs, h0, mask, gru, ma_bn, bn,
                                  f=f, fp=fp, n=n, npad=npad)
    (_msgs_t, h0m, mask_row, c,
     wir, wiz, win, whr, whz, whn, bir, biz, bin_c, bhr, bhz, bhn,
     mw, mbias, sw, sb) = packed
    if transposed_io:
        g_t = jnp.pad(g_ht.astype(dt),
                      ((0, fp - g_ht.shape[0]),
                       (0, npad - g_ht.shape[1])))
    else:
        g_t = mat_t(g_ht)

    kernel = functools.partial(_merged_bwd_kernel, steps=steps, fp=fp,
                               blk=blk)
    fpn = jax.ShapeDtypeStruct((fp, npad), dt)
    fpf = jax.ShapeDtypeStruct((fp, fp), dt)
    fc = jax.ShapeDtypeStruct((fp, 1), dt)
    # the three (fp, npad) outputs must be pinned to HBM: ANY outputs in a
    # mixed tuple get STACK-ALLOCATED in VMEM (CLAUDE.md / spmm.py gotcha)
    # — at blk=13184 that alone blew the 16 MB scoped-VMEM stack. Tag the
    # out_shape pltpu.HBM AND alias each to an ANY input: dh0 rides the
    # g_t cotangent buffer (in-place walk), dmb/dmsgs get pre-zeroed
    # stand-ins.
    dmb_zeros = jnp.zeros((fp, npad), dt)
    dmsgs_zeros = jnp.zeros((fp, npad), dt)
    fpn_hbm = fpn if interpret else pltpu.HBM((fp, npad), dt)
    outs = pl.pallas_call(
        kernel,
        grid=(steps + 2, nb),
        in_specs=[_any(), _any(), _any(),
                  pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [_vm()] * 16 + [_vm(), _any(), _any(), _any()],
        out_specs=tuple([_any()] * 3 + [_vm()] * 16),
        out_shape=(fpn_hbm, fpn_hbm, fpn_hbm,
                   fpf, fpf, fpf, fpf, fpf, fpf,
                   fc, fc, fc, fc, fc, fc, fc, fc, fc, fc),
        input_output_aliases={21: 0, 22: 1, 23: 2},
        scratch_shapes=[
            pltpu.VMEM((fp, blk), dt),          # sblk (s_{t-1})
            pltpu.VMEM((fp, blk), dt),          # pblk (htil slot 0)
            pltpu.VMEM((1, blk), dt),           # mblk
            pltpu.VMEM((fp, blk), dt),          # ghblk (cotangent)
            pltpu.VMEM((fp, blk), dt),          # hblk (htil_t / x̂_{t-1})
            pltpu.VMEM((fp, blk), dt),          # dmbblk
            pltpu.VMEM((fp, 2), dt),            # accC (this pass's S1/S2)
            pltpu.VMEM((fp, 2), dt),            # accN (next pass's)
            pltpu.SemaphoreType.DMA((6,)),
        ],
        # the ~20 live (fp, blk) GRU-bwd temporaries put the VMEM stack at
        # ~16.5 MB for a single 13184-lane block — raise the per-kernel
        # limit (rides with the kernel; no jit-level flag needed) so the
        # fewest-blocks layout compiles everywhere
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 2 ** 20),
        interpret=interpret,
    )(h0m, htil, mask_row, c,
      wir, wiz, win, whr, whz, whn, bir, biz, bin_c, bhr, bhz, bhn,
      mw, mbias, sw, sb, stats, g_t, dmb_zeros, dmsgs_zeros)
    (dh0_t, _dmb, dmsgs_t, dwir, dwiz, dwin, dwhr, dwhz, dwhn,
     dbir, dbiz, dbin_, dbhr, dbhz, dbhn, dmw, dmbb, dsw, dsb) = outs

    def unblocks(ws):
        return jnp.stack([w[:f, :f] for w in ws], axis=1).reshape(f, 3 * f)

    def uncol3(cs):
        return jnp.concatenate([cv[:f, 0] for cv in cs])

    dgru = {
        "w_ih": unblocks([dwir, dwiz, dwin]).astype(gru["w_ih"].dtype),
        "w_hh": unblocks([dwhr, dwhz, dwhn]).astype(gru["w_hh"].dtype),
        "b_ih": uncol3([dbir, dbiz, dbin_]).astype(gru["b_ih"].dtype),
        "b_hh": uncol3([dbhr, dbhz, dbhn]).astype(gru["b_hh"].dtype),
    }
    dma = {"weight": dmw[:f, 0].astype(ma_bn["weight"].dtype),
           "bias": dmbb[:f, 0].astype(ma_bn["bias"].dtype)}
    dbn = {"weight": dsw[:f, 0].astype(bn["weight"].dtype),
           "bias": dsb[:f, 0].astype(bn["bias"].dtype)}
    if transposed_io:
        return dmsgs_t, dh0_t, dgru, dma, dbn
    return (dmsgs_t[:f, :n].T.astype(msgs.dtype),
            dh0_t[:f, :n].T.astype(h0.dtype), dgru, dma, dbn)


def pick_stream_blk(n: int, cap: int = 16384) -> int:
    """Fewest-blocks 128-aligned node-block size for the streaming kernels.
    Every (pass, block) grid step costs ~7 serialized DMA waits, so fewer,
    larger blocks win (measured: blk 8192 -> one 13184 block at batch 1024
    cut the merged backward's share); minimizing round_up(n, blk) also
    removes pad-lane compute (blk=8192 at npad=13184 rounded to 16384 —
    20% of every pass was padding). cap=16384 keeps the ~6 (fp, blk) f32
    VMEM scratch buffers near 6 MB, inside the 16 MB scoped-VMEM stack."""
    npad = _round_up(n, 128)
    nb = -(-npad // cap)
    return _round_up(-(-npad // nb), 128)


def make_recurrence_op_merged(steps: int, f: int, n: int, *,
                              blk: int | None = None,
                              interpret: bool = False,
                              bwd_mode: str = "fused",
                              bwd_impl: str = "auto"):
    """Merged-pass streaming recurrence (see block comment above): T+2
    grid passes in EACH direction, ~3fp·N traffic per step. Same contract
    as make_recurrence_op; any node count.

    bwd_impl: 'auto' picks the VMEM-resident single-pass backward
    (_vmem_bwd_kernel) whenever the residual set + live panels fit the
    raised per-kernel VMEM budget, else the streaming merged reverse;
    'stream' / 'vmem' force one (tests cover both)."""
    if blk is None:
        blk = pick_stream_blk(n)

    @jax.custom_vjp
    def op(msgs, h0, mask, gru, ma_bn, bn):
        out, _ = _merged_forward_call(msgs, h0, mask, gru, ma_bn, bn,
                                      steps=steps, f=f, n=n, blk=blk,
                                      interpret=interpret)
        return out

    def fwd(msgs, h0, mask, gru, ma_bn, bn):
        out, extras = _merged_forward_call(msgs, h0, mask, gru, ma_bn, bn,
                                           steps=steps, f=f, n=n, blk=blk,
                                           interpret=interpret)
        if bwd_mode == "xla":
            return out, (msgs, h0, mask, gru, ma_bn, bn)
        htil, stats = extras
        return out, (msgs, h0, mask, gru, ma_bn, bn, htil, stats)

    def bwd(res, cot):
        if bwd_mode == "xla":
            msgs, h0, mask, gru, ma_bn, bn = res
            _, vjp = jax.vjp(
                lambda m_, h_, g_, a_, b_: reference_recurrence(
                    m_, h_, mask, g_, a_, b_, steps=steps),
                msgs, h0, gru, ma_bn, bn)
            dm, dh, dg, da_, db_ = vjp(cot)
            return dm, dh, None, dg, da_, db_
        g_ht, _, _ = cot          # stats feed running-state EMAs (no grad)
        npad_h = res[6].shape[1]  # htil's lane count (blk-rounded)
        if bwd_impl == "vmem" or (bwd_impl == "auto"
                                  and _vmem_bwd_fits(steps, f, npad_h)):
            dm, dh, dg, da_, db_ = _vmem_backward_call(
                res, g_ht, steps=steps, f=f, n=n, npad=npad_h,
                interpret=interpret, transposed_io=False)
        else:
            dm, dh, dg, da_, db_ = _merged_backward_call(
                res, g_ht, steps=steps, f=f, n=n, blk=blk,
                interpret=interpret)
        return dm, dh, None, dg, da_, db_

    op.defvjp(fwd, bwd)
    return op


# the monolithic forward holds ~12 (fp, N) buffers in VMEM; past this node
# count use the blocked streaming variant
MONOLITHIC_MAX_NODES = 16384


def make_recurrence_op_auto(steps: int, f: int, n: int, *,
                            interpret: bool = False):
    """Monolithic fused op while its BACKWARD's stashed states fit scoped
    VMEM (everything resident, fastest); otherwise the MERGED-pass
    streaming variant — fused in BOTH directions at any node count.
    (Measured at N=13312/T=6 on 1× v5e: merged 141.7 µs vs blocked
    168.7 µs per fwd+bwd; the old large-N fallback — blocked fwd +
    XLA-VJP bwd — left 2.5× on the table at batch 2048.)"""
    npad = _round_up(n, 128)
    fp = _round_up(f, 16)
    bwd_est = (steps + 14) * fp * npad * 4
    if n <= MONOLITHIC_MAX_NODES and bwd_est <= 13 * 2 ** 20:
        return make_recurrence_op(steps, f, n, interpret=interpret,
                                  bwd_mode="fused")
    return make_recurrence_op_merged(steps, f, n, interpret=interpret,
                                     bwd_mode="fused")
