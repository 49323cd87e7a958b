"""Pallas TPU fused kernel for the BILINEAR message family
(basic_model_ecfp.py:5-63 semantics — round-5 VERDICT item 4).

The family was the last XLA-only row and the slowest (1.28 ms train at
batch 1024). The attribution probe (scripts/probe_bilinear.py) put
0.62 ms of that in the PURE gather/scatter skeleton (two gathers + a
segment-sum per step on nf=2-wide tensors — TPU scatters serialize), the
bilinear math itself at ~0.04 ms and GRU+readout at 0.17 ms. This kernel
removes the scatters with the repo's standard windowed one-hot MXU
machinery (kernels/fused_step.py conventions).

Semantics per step t (message_input='state', update_hidden='initial',
aggregation='adj', no norms — the family's only coherent shape):

    msg_t[v, m] = Σ_{e: dst=v} Σ_{n,j} W(e)[n, m, j]·h_{t-1}[src_e, n]
                                               ·h_{t-1}[dst_e, j]
    h_t = GRU(msg_t, h_0)            (hidden is ALWAYS the initial state)

with W(e) = reshape(edge_feats_e, (nf, nf, nf)) — parameterless, and
W(0) = 0 so padded/non-edges vanish natively (no A0 correction needed).

Kernel formulation: the per-edge bilinear is an A-form matvec over the
OUTER-PRODUCT features φ_e = vec(h_src ⊗ h_dst) (nf² wide):
msg_e = A_{vid(e)}·φ_e with A_k[m, n·nf+j] = W_k[n, m, j], where the
edge-feature VOCAB (≤16 distinct encoded bond rows,
graphs/batching.py::attach_edge_vocab) indexes the tiny A table. Since
messages come from the EVOLVING state, the grid interleaves edge passes
and GRU steps: grid (steps, nblk+1) — per step, programs 0..nblk−1
gather the CURRENT state's src/dst windows, build φ in-register (nf
static row-embedding matmuls — no 3D reshapes), contract against the
whole A table, mask to each edge's own vocab row, and scatter-add via
the dst one-hot; program nblk runs the masked GRU and stashes h_t.

The backward walks the same grid in reverse: per step, program 0 runs
the GRU backward (gates recomputed from the stashed msgs_t and h0) and
emits dmsgs_t; the edge programs then push dφ = A^T·dmsg through the
outer product into BOTH endpoint gradients of h_{t-1}. amat carries no
gradient (the reference's bilinear message has no parameters and the
eligible configs feed raw/frozen edge features).

The readout (concat-state-history gated output) and loss stay in XLA —
the probe prices them at ~0.17 ms and the op returns the full state
history for the concat.

Parity: tests/test_fused_bilinear.py vs sparse_mpnn_apply.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpnn_tpu.kernels.fused_step import (_edge_onehots, _round_up,
                                         _sel_t, _vmem_params_of)
from mpnn_tpu.kernels.fused_psteps import _pack_edge_blocks
from mpnn_tpu.kernels.recurrence import _dot, _gru_fwd_t


def _embed_rows(n_i: int, f: int, fp: int, f2p: int, dt):
    """(f2p, fp) row-embedding: E[n_i·f + j, j] = 1 for j < f — places an
    (f, be) block at rows n_i·f.. of an (f2p, be) panel via one matmul
    (the no-3D-reshape φ constructor)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (f2p, fp), 0)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (f2p, fp), 1)
    return jnp.logical_and(r == n_i * f + cidx, cidx < f).astype(dt)


def _bil_fwd_kernel(win_ref, src_ref, dst_ref, vid_ref,
                    a2t_ref, h0_ref, mask_ref,
                    wir_ref, wiz_ref, win2_ref, whr_ref, whz_ref, whn_ref,
                    bir_ref, biz_ref, bin_ref, bhr_ref, bhz_ref, bhn_ref,
                    *out_and_scratch,
                    steps: int, f: int, fp: int, f2p: int, kmf: int,
                    kmfp: int, be: int, window: int, nblk: int,
                    keep_msgs: bool = True):
    # keep_msgs=False is the SERVING flavor: the msgs residual feeds only
    # the backward, so inference skips its (steps·fp, npad) HBM writes
    # (review finding — dead bandwidth in the eval path)
    if keep_msgs:
        hist_out, msgs_out, msgs, hcur = out_and_scratch
    else:
        hist_out, msgs, hcur = out_and_scratch
        msgs_out = None
    ts = pl.program_id(0)                   # message step 0..steps-1
    p = pl.program_id(1)                    # 0..nblk
    dt = jnp.float32

    @pl.when(jnp.logical_and(ts == 0, p == 0))
    def _():
        hcur[:] = h0_ref[:] * mask_ref[:]

    @pl.when(p == 0)
    def _():
        msgs[:] = jnp.zeros_like(msgs)

    @pl.when(p < nblk)
    def _():
        ws = pl.multiple_of(win_ref[p], 128)
        src = src_ref[p, :] - ws
        dst = dst_ref[p, :] - ws
        vid = vid_ref[p, :]
        oh_src, oh_dst, ohm = _edge_onehots(
            src, dst, vid, be=be, window=window, f=f, kmf=kmf,
            kmfp=kmfp, dtype=dt)
        hw = hcur[:, pl.ds(ws, window)]
        hs = _dot(hw, oh_src.T)             # (fp, be)
        hd = _dot(hw, oh_dst.T)
        phi = jnp.zeros((f2p, be), dt)
        for n_i in range(f):
            en = _embed_rows(n_i, f, fp, f2p, dt)
            phi += _dot(en, hd * hs[n_i:n_i + 1, :])
        bulk = _dot(a2t_ref[:], phi)        # (kmfp, be)
        me = _dot(_sel_t(f, fp, kmf, kmfp, dt), ohm * bulk)
        msgs[:, pl.ds(ws, window)] += _dot(me, oh_dst)

    @pl.when(p == nblk)
    def _():
        m = mask_ref[:]
        mb = msgs[:] * m
        if keep_msgs:
            msgs_out[pl.ds(ts * fp, fp), :] = mb
        gr = _dot(wir_ref[:].T, mb) + bir_ref[:]
        gz = _dot(wiz_ref[:].T, mb) + biz_ref[:]
        gn = _dot(win2_ref[:].T, mb) + bin_ref[:]
        hnew = _gru_fwd_t(h0_ref[:] * m, gr, gz, gn, whr_ref[:],
                          whz_ref[:], whn_ref[:], bhr_ref[:], bhz_ref[:],
                          bhn_ref[:], m)
        hcur[:] = hnew
        hist_out[pl.ds(ts * fp, fp), :] = hnew


def _bil_bwd_kernel(win_ref, src_ref, dst_ref, vid_ref,
                    a2tt_ref, h0_ref, mask_ref, hist_ref, msgs_ref,
                    ghist_ref,
                    wir_ref, wiz_ref, win2_ref, whr_ref, whz_ref, whn_ref,
                    bir_ref, biz_ref, bin_ref, bhr_ref, bhz_ref, bhn_ref,
                    dh0_out,
                    dwir_out, dwiz_out, dwin_out,
                    dwhr_out, dwhz_out, dwhn_out,
                    dbir_out, dbiz_out, dbin_out, dbhn_out,
                    dh_acc, dmsgs_s,
                    *, steps: int, f: int, fp: int, f2: int, f2p: int,
                    kmf2: int, kmf2p: int, be: int, window: int,
                    nblk: int):
    """Reverse walk over grid (steps+1, nblk+1): iteration ts handles
    step t = steps − ts (ts < steps); dh_acc carries the edge-scattered
    ∂L/∂h_{t-1} between steps; the final iteration folds it into dh0."""
    ts = pl.program_id(0)
    p = pl.program_id(1)
    t = steps - ts
    dt = jnp.float32

    @pl.when(jnp.logical_and(ts == 0, p == 0))
    def _():
        dh_acc[:] = jnp.zeros_like(dh_acc)
        dh0_out[:] = jnp.zeros_like(dh0_out)
        for o in (dwir_out, dwiz_out, dwin_out, dwhr_out, dwhz_out,
                  dwhn_out, dbir_out, dbiz_out, dbin_out, dbhn_out):
            o[:] = jnp.zeros_like(o)

    @pl.when(jnp.logical_and(ts < steps, p == 0))
    def _():
        m = mask_ref[:]
        gh = ghist_ref[pl.ds((t - 1) * fp, fp), :] + dh_acc[:]
        dh_acc[:] = jnp.zeros_like(dh_acc)
        # GRU backward, hidden = h0 (update_hidden='initial'), input =
        # the stashed msgs_t — the monolithic psteps walk's formulas
        hprev = h0_ref[:] * m
        mb = msgs_ref[pl.ds((t - 1) * fp, fp), :]
        gr = _dot(wir_ref[:].T, mb) + bir_ref[:]
        gz = _dot(wiz_ref[:].T, mb) + biz_ref[:]
        gn = _dot(win2_ref[:].T, mb) + bin_ref[:]
        rh = _dot(whr_ref[:].T, hprev) + bhr_ref[:]
        zh = _dot(whz_ref[:].T, hprev) + bhz_ref[:]
        nh = _dot(whn_ref[:].T, hprev) + bhn_ref[:]
        sr = jax.nn.sigmoid(gr + rh)
        sz = jax.nn.sigmoid(gz + zh)
        z = sz * m
        tn = jnp.tanh(gn + (sr * m) * nh)
        n_ = tn * m
        dhp = gh * m
        dz = dhp * (hprev - n_)
        dn = dhp * (1.0 - z)
        da_n = dn * m * (1.0 - tn * tn)
        dr = da_n * nh
        dnh = da_n * (sr * m)
        da_r = dr * m * sr * (1.0 - sr)
        da_z = dz * m * sz * (1.0 - sz)
        dh0_out[:] += (dhp * z + _dot(whr_ref[:], da_r)
                       + _dot(whz_ref[:], da_z)
                       + _dot(whn_ref[:], dnh)) * m
        dwhr_out[:] += _dot(hprev, da_r.T)
        dwhz_out[:] += _dot(hprev, da_z.T)
        dwhn_out[:] += _dot(hprev, dnh.T)
        dwir_out[:] += _dot(mb, da_r.T)
        dwiz_out[:] += _dot(mb, da_z.T)
        dwin_out[:] += _dot(mb, da_n.T)
        dbir_out[:] += jnp.sum(da_r, axis=1, keepdims=True)
        dbiz_out[:] += jnp.sum(da_z, axis=1, keepdims=True)
        dbin_out[:] += jnp.sum(da_n, axis=1, keepdims=True)
        dbhn_out[:] += jnp.sum(dnh, axis=1, keepdims=True)
        dmsgs_s[:] = (_dot(wir_ref[:], da_r) + _dot(wiz_ref[:], da_z)
                      + _dot(win2_ref[:], da_n)) * m

    @pl.when(jnp.logical_and(
        ts < steps, jnp.logical_and(p >= 1, p <= nblk)))
    def _():
        i = p - 1
        ws = pl.multiple_of(win_ref[i], 128)
        src = src_ref[i, :] - ws
        dst = dst_ref[i, :] - ws
        vid = vid_ref[i, :]
        # f2-row vocab mask + selection (φ-space); node one-hots shared
        oh_src, oh_dst, ohm2 = _edge_onehots(
            src, dst, vid, be=be, window=window, f=f2, kmf=kmf2,
            kmfp=kmf2p, dtype=dt)
        # h_{t-1} window: hist slot t−2 for t ≥ 2, else masked h0
        # (clamped index keeps the discarded branch in-bounds)
        tp2 = jnp.maximum(t - 2, 0)
        histw = hist_ref[pl.ds(tp2 * fp, fp), pl.ds(ws, window)]
        h0w = h0_ref[:, pl.ds(ws, window)] \
            * mask_ref[:, pl.ds(ws, window)]
        hw = jnp.where(t == 1, h0w, histw)
        hs = _dot(hw, oh_src.T)
        hd = _dot(hw, oh_dst.T)
        gd = _dot(dmsgs_s[:, pl.ds(ws, window)], oh_dst.T)  # (fp, be)
        dphi = _dot(_sel_t(f2, f2p, kmf2, kmf2p, dt),
                    ohm2 * _dot(a2tt_ref[:], gd))           # (f2p, be)
        dhs = jnp.zeros((fp, be), dt)
        dhd = jnp.zeros((fp, be), dt)
        rcol = jax.lax.broadcasted_iota(jnp.int32, (fp, 1), 0)
        for n_i in range(f):
            en = _embed_rows(n_i, f, fp, f2p, dt)
            tmp = _dot(en.T, dphi)                          # (fp, be)
            dhd += tmp * hs[n_i:n_i + 1, :]
            srow = jnp.sum(tmp * hd, axis=0, keepdims=True)  # (1, be)
            dhs += (rcol == n_i).astype(dt) * srow
        dh_acc[:, pl.ds(ws, window)] += \
            _dot(dhs, oh_src) + _dot(dhd, oh_dst)

    @pl.when(jnp.logical_and(ts == steps, p == 0))
    def _():
        # after the last reversed step, dh_acc holds the message-path
        # gradient into h_0
        dh0_out[:] += dh_acc[:]


def make_fused_bilinear_op(steps: int, f: int, n: int, k_vocab: int, *,
                           block_edges: int = 512, window: int = 512,
                           interpret: bool = False):
    """Fused bilinear message+GRU chain.

    op(amat (K, f, f²), h0 (N, f), mask (N, 1), gru, vid, src, dst, win)
      -> hist (N, steps·f)   (the stacked h_1..h_T state history)

    Differentiable in h0 and gru; amat carries no gradient (parameterless
    reference message over raw/frozen edge features)."""
    npad = _round_up(n, 128)
    fp = _round_up(f, 16)
    f2 = f * f
    f2p = _round_up(f2, 16)
    kmf = k_vocab * f
    kmfp = _round_up(kmf, 16)
    kmf2 = k_vocab * f2
    kmf2p = _round_up(kmf2, 16)
    dt = jnp.float32

    def _vm():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    def pack(amat, a0_unused, h0, mask, gru):
        padf = ((0, 0), (0, fp - f))

        def mat_t(x):
            xt = jnp.pad(x.astype(dt), padf).T
            return xt if npad == n else jnp.pad(xt, ((0, 0),
                                                     (0, npad - n)))

        def blocks(w):
            b = w.astype(dt).reshape(f, 3, f)
            return [jnp.pad(b[:, i, :], ((0, fp - f), (0, fp - f)))
                    for i in range(3)]

        def col3(v):
            b = v.astype(dt).reshape(3, f)
            return [jnp.pad(b[i][:, None], ((0, fp - f), (0, 0)))
                    for i in range(3)]

        a2t = jnp.pad(amat.astype(dt).reshape(kmf, f2),
                      ((0, kmfp - kmf), (0, f2p - f2)))
        # transposed table for the backward: rows k·f² + (n·f+j), cols m
        a2tt = jnp.pad(
            jnp.transpose(amat.astype(dt), (0, 2, 1)).reshape(kmf2, f),
            ((0, kmf2p - kmf2), (0, fp - f)))
        mask_row = jnp.pad(mask.astype(dt).reshape(1, n),
                           ((0, 0), (0, npad - n)))
        return ([a2t, mat_t(h0), mask_row]
                + blocks(gru["w_ih"]) + blocks(gru["w_hh"])
                + col3(gru["b_ih"]) + col3(gru["b_hh"]), a2tt)

    def run_fwd(amat, h0, mask, gru, vid, src, dst, win,
                keep_msgs=True):
        packed, _ = pack(amat, None, h0, mask, gru)
        src2, dst2, vid2, nblk = _pack_edge_blocks(vid, src, dst,
                                                   block_edges)
        kernel = functools.partial(
            _bil_fwd_kernel, steps=steps, f=f, fp=fp, f2p=f2p, kmf=kmf,
            kmfp=kmfp, be=block_edges, window=window, nblk=nblk,
            keep_msgs=keep_msgs)
        n_out = 2 if keep_msgs else 1
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(steps, nblk + 1),
            in_specs=[_vm()] * (3 + len(packed)),
            out_specs=tuple([_vm()] * n_out),
            scratch_shapes=[
                pltpu.VMEM((fp, npad), dt),     # msgs accumulator
                pltpu.VMEM((fp, npad), dt),     # current state
            ],
        )
        stash = jax.ShapeDtypeStruct((steps * fp, npad), dt)
        outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(stash, stash) if keep_msgs else (stash,),
            # hardware-calibrated: the eval forward's measured stack need
            # at 52,480 padded nodes (T=2) was 42.69 MiB — 8+2T panels
            # left it 2.25 MiB short; 11+2T bounds it with headroom
            compiler_params=_vmem_params_of(fp, npad, 11 + 2 * steps),
            interpret=interpret,
        )(win, src2, dst2, vid2, *packed)
        return outs if keep_msgs else (outs[0], None)

    def public(hist):
        return jnp.concatenate(
            [hist[t * fp:t * fp + f, :n].T for t in range(steps)],
            axis=-1)

    @jax.custom_vjp
    def op(amat, h0, mask, gru, vid, src, dst, win):
        # primal-only path (serving): skip the backward-only msgs stash
        hist, _ = run_fwd(amat, h0, mask, gru, vid, src, dst, win,
                          keep_msgs=False)
        return public(hist).astype(h0.dtype)

    def fwd(amat, h0, mask, gru, vid, src, dst, win):
        hist, msgs = run_fwd(amat, h0, mask, gru, vid, src, dst, win)
        return public(hist).astype(h0.dtype), (
            amat, h0, mask, gru, vid, src, dst, win, hist, msgs)

    def bwd(res, gout):
        amat, h0, mask, gru, vid, src, dst, win, hist, msgs = res
        packed, a2tt = pack(amat, None, h0, mask, gru)
        src2, dst2, vid2, nblk = _pack_edge_blocks(vid, src, dst,
                                                   block_edges)
        # cotangent of the stacked history, back to panel layout
        g = gout.astype(dt)
        ghist = jnp.concatenate(
            [jnp.pad(g[:, t * f:(t + 1) * f].T,
                     ((0, fp - f), (0, npad - n)))
             for t in range(steps)], axis=0)
        kernel = functools.partial(
            _bil_bwd_kernel, steps=steps, f=f, fp=fp, f2=f2, f2p=f2p,
            kmf2=kmf2, kmf2p=kmf2p, be=block_edges, window=window,
            nblk=nblk)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(steps + 1, nblk + 1),
            in_specs=[_vm()] * (3 + 6 + (len(packed) - 3)),
            out_specs=tuple([_vm()] * 11),
            scratch_shapes=[
                pltpu.VMEM((fp, npad), dt),     # dh_acc
                pltpu.VMEM((fp, npad), dt),     # dmsgs
            ],
        )
        fpf = jax.ShapeDtypeStruct((fp, fp), dt)
        fc = jax.ShapeDtypeStruct((fp, 1), dt)
        outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((fp, npad), dt),
                       fpf, fpf, fpf, fpf, fpf, fpf,
                       fc, fc, fc, fc),
            # hardware-calibrated: the compiler's stack need at 26,240
            # padded nodes (T=2) was 26.36 MiB — 10+2T panels left it
            # 1.93 MiB short; 14+2T bounds it with ~15% headroom
            compiler_params=_vmem_params_of(fp, npad, 14 + 2 * steps),
            interpret=interpret,
        )(win, src2, dst2, vid2,
          a2tt, packed[1], packed[2], hist, msgs, ghist,
          *packed[3:])
        (dh0_t, dwir, dwiz, dwin_, dwhr, dwhz, dwhn,
         dbir, dbiz, dbin_, dbhn) = outs

        def _unblocks(ws_):
            return jnp.stack([w[:f, :f] for w in ws_],
                             axis=1).reshape(f, 3 * f)

        def _uncol3(cs_):
            return jnp.concatenate([cv[:f, 0] for cv in cs_])

        dgru = {
            "w_ih": _unblocks([dwir, dwiz, dwin_]).astype(
                gru["w_ih"].dtype),
            "w_hh": _unblocks([dwhr, dwhz, dwhn]).astype(
                gru["w_hh"].dtype),
            "b_ih": _uncol3([dbir, dbiz, dbin_]).astype(
                gru["b_ih"].dtype),
            "b_hh": _uncol3([dbir, dbiz, dbhn]).astype(
                gru["b_hh"].dtype),
        }
        return (jnp.zeros_like(amat), dh0_t[:f, :n].T.astype(h0.dtype),
                None, dgru, None, None, None, None)

    op.defvjp(fwd, bwd)
    return op
