"""Pallas TPU fused WHOLE-STEP kernel for the flagship training step.

One forward and one backward pallas_call covering everything between the
edge-MLP vocab table and the optimizer:

    SpMM (windowed one-hot gather-contract-scatter, kernels/spmm.py math)
    + A0 rank-1 per-graph correction  (models/sparse.py docstring)
    + message bias
    + ma_bn -> [GRU -> bn] x T        (kernels/recurrence.py math)
    + gated graph-level readout       (reference graph_level_output.py:36-47)
    + masked MSE loss

The round-2 ablation (scripts/ablate_step.py) attributed the 0.56 ms
flagship step at batch 1024 as ~180us messages, ~190us recurrence+glue,
~160us readout+loss, ~80us dispatch — the readout/loss and glue cost being
pure small-op/scatter launch latency over (N, 10)-wide tensors. This kernel
removes all of it: 2 launches per train step instead of ~18 + 8 scatters.

Layout: everything transposed to (features, N) — lanes are nodes — as in
kernels/recurrence.py. The SpMM rides per-edge-block node windows with
128-ALIGNED lane starts (Mosaic supports dynamic lane slices at 128-aligned
offsets), so gather/scatter are one-hot MXU matmuls into lane windows of
the VMEM-resident message buffer. Per-graph segment sums (A0 correction,
readout) become one-hot membership matmuls over host-planned 128-graph
windows per node block (packed batches store graphs contiguously, so a
512-node block spans only ~40 graphs).

Semantics (flagship lipo config): share_message_weights,
message_input='initial', msg_norm=state_norm='bn1d', update_hidden='state',
graph_level readout, training mode, masked-MSE loss
    loss = sum((out - y)^2 * gmask) / sum(gmask).

Reference chain: mpnn_functions/message/edge_network.py:42-51 (messages),
aggregation/adj_message_agg.py (sum), update/gru_update.py, batch_norm
(MaskBatchNorm1d), readout/graph_level_output.py:36-47.

Parity: tests/test_fused_step.py (interpret mode) against the pure-JAX
composition reference_fused_step below, itself built from the proven
pieces (spmm_reference, reference_recurrence, sparse_graph_level_output).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpnn_tpu.kernels.recurrence import (BN_EPS, VAR_CLAMP, _bn_bwd_t,
                                         _bn_fwd_t, _dot, _gru_fwd_t,
                                         reference_recurrence)
from mpnn_tpu.kernels.spmm import spmm_reference

_BIG_NEG = -1e9


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# host-side planning
# ---------------------------------------------------------------------------

class FusedStepPlan(NamedTuple):
    win_start: np.ndarray     # (nblk,) int32, 128-aligned node-window starts
    g0: np.ndarray            # (n_node_blocks,) int32, 128-aligned graph-
    #                           window start per node block
    block_edges: int
    window: int
    node_block: int
    graph_window: int


def plan_fused_step(src: np.ndarray, dst: np.ndarray, edge_mask: np.ndarray,
                    node_graph: np.ndarray, node_cap: int, num_graphs: int,
                    block_edges: int = 512, node_block: int = 512,
                    graph_window: int = 128) -> Optional[FusedStepPlan]:
    """Plan 128-aligned node windows per edge block and a graph window per
    node block. Returns None when the packing premise fails (caller falls
    back to the unfused path). Pure host-side numpy, once per batch."""
    e = src.shape[0]
    nblk = _round_up(e, block_edges) // block_edges
    pad = nblk * block_edges - e
    real = edge_mask > 0
    lo = np.where(real, np.minimum(src, dst), np.iinfo(np.int32).max)
    hi = np.where(real, np.maximum(src, dst), -1)
    if pad:
        lo = np.concatenate([lo, np.full(pad, np.iinfo(np.int32).max)])
        hi = np.concatenate([hi, np.full(pad, -1)])
    lo = lo.reshape(nblk, block_edges).min(axis=1)
    hi = hi.reshape(nblk, block_edges).max(axis=1)
    empty = hi < 0
    lo = np.where(empty, 0, lo)
    hi = np.where(empty, 0, hi)
    ws = (lo // 128) * 128                      # lane-aligned window starts
    npad = _round_up(node_cap, 128)
    window = 128
    span = hi - ws + 1
    need = int(span.max()) if len(span) else 1
    window = _round_up(max(need, 128), 128)
    if window > min(4 * block_edges, npad):
        return None                              # locality premise failed
    ws = np.clip(ws, 0, max(npad - window, 0)).astype(np.int32)

    # graph window per node block (graphs are node-contiguous)
    while node_block >= 128 and npad % node_block:
        node_block //= 2
    if npad % node_block:
        return None
    nb = npad // node_block
    ng = np.asarray(node_graph)
    gp = _round_up(max(num_graphs, 1), 128)
    g0 = np.zeros(nb, np.int32)
    for j in range(nb):
        blk = ng[j * node_block:(j + 1) * node_block]
        realg = blk[blk < num_graphs]
        if realg.size == 0:
            g0[j] = max(gp - graph_window, 0)
            continue
        glo = (int(realg.min()) // 128) * 128
        ghi = int(realg.max())
        if ghi - glo + 1 > graph_window:
            return None                          # block spans too many graphs
        g0[j] = min(glo, max(gp - graph_window, 0))
    return FusedStepPlan(ws, g0, block_edges, window, node_block,
                         graph_window)


def attach_fused_plan(batch: dict, block_edges: int = 512,
                      node_block: int = 512) -> dict:
    """Append 'fs_win'/'fs_g0' (+static sizes) to a packed batch. No-op when
    planning fails (continuous fallback to the unfused path)."""
    plan = plan_fused_step(
        np.asarray(batch["edge_src"]), np.asarray(batch["edge_dst"]),
        np.asarray(batch["edge_mask"]), np.asarray(batch["node_graph"]),
        int(np.asarray(batch["node_feats"]).shape[0]),
        int(np.asarray(batch["graph_mask"]).shape[0]),
        block_edges, node_block)
    if plan is None:
        return batch
    out = dict(batch)
    out["fs_win"] = plan.win_start
    out["fs_g0"] = plan.g0
    out["fs_block_edges"] = plan.block_edges
    out["fs_window"] = plan.window
    out["fs_node_block"] = plan.node_block
    return out


# ---------------------------------------------------------------------------
# pure-JAX reference (parity oracle; composed from the proven pieces)
# ---------------------------------------------------------------------------

def reference_fused_step(amat, a0, mbias, h0, mask, node_graph, gru, ma_bn,
                         bn, ro, labels, gmask, vid, src, dst, *,
                         steps: int):
    """h0 must be PRE-MASKED. Returns (loss, out, ma_stats, step_stats)."""
    from mpnn_tpu.models.sparse import sparse_graph_level_output

    num_graphs = gmask.shape[0]
    agg = spmm_reference(amat, h0, vid, src, dst)
    s = jax.ops.segment_sum(h0, node_graph, num_segments=num_graphs + 1)
    base = s[node_graph] @ a0.T
    msgs = agg + base + mbias
    h, ma_stats, step_stats = reference_recurrence(
        msgs, h0, mask, gru, ma_bn, bn, steps=steps)
    x = jnp.concatenate([h, h0], axis=-1)
    out = sparse_graph_level_output(ro, x, mask, node_graph, num_graphs)
    per = ((out - labels[:, None]) ** 2) * gmask[:, None]
    loss = per.sum() / gmask.sum()
    return loss, out, ma_stats, step_stats


# ---------------------------------------------------------------------------
# in-kernel SpMM helpers (transposed layout)
# ---------------------------------------------------------------------------

def _edge_onehots(src, dst, vid, *, be, window, f, kmf, kmfp, dtype):
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (be, window), 1)
    oh_src = (iota_w == src[:, None]).astype(dtype)
    oh_dst = (iota_w == dst[:, None]).astype(dtype)
    row = jax.lax.broadcasted_iota(jnp.int32, (kmfp, be), 0)
    ohm = jnp.logical_and(row // f == vid[None, :], row < kmf).astype(dtype)
    return oh_src, oh_dst, ohm


def _sel_t(f, fp, kmf, kmfp, dtype):
    """(fp, kmfp): sel[m, k*f+m] = 1 for m < f, k*f+m < kmf."""
    r = jax.lax.broadcasted_iota(jnp.int32, (fp, kmfp), 0)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (fp, kmfp), 1)
    return jnp.logical_and(jnp.logical_and(r == cidx % f, r < f),
                           cidx < kmf).astype(dtype)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(win_ref, g0_ref, src_ref, dst_ref, vid_ref,
                a2t_ref, a0_ref, mbias_ref, h0_ref, mask_ref, ng_ref,
                wir_ref, wiz_ref, win2_ref, whr_ref, whz_ref, whn_ref,
                bir_ref, biz_ref, bin_ref, bhr_ref, bhz_ref, bhn_ref,
                mw_ref, mb_ref, sw_ref, sb_ref,
                wi1_ref, wi2_ref, wj1_ref, wj2_ref, bri_ref, brj_ref,
                odm_ref, y_ref, gm_ref,
                loss_out, out_t, h_out, ma_mean_out, ma_var_out,
                bn_mean_out, bn_var_out,
                msgs, s_ref,
                *, steps: int, f: int, fp: int, kmf: int, kmfp: int,
                be: int, window: int, nblk: int, nbk: int, gw: int):
    p = pl.program_id(0)
    dt = jnp.float32

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
            src, dst, vid, be=be, window=window, f=f, kmf=kmf, kmfp=kmfp,
            dtype=dt)
        hw = h0_ref[:, pl.ds(ws, window)]                     # (fp, W)
        hs = _dot(hw, oh_src.T)                               # (fp, BE)
        bulk = _dot(a2t_ref[:], hs)                           # (kmfp, BE)
        sel = _sel_t(f, fp, kmf, kmfp, dt)
        me = _dot(sel, ohm * bulk)                            # (fp, BE)
        msgs[:, pl.ds(ws, window)] += _dot(me, oh_dst)        # (fp, W)

    @pl.when(p == nblk)
    def _():
        mask_l = mask_ref[:]
        c = jnp.sum(mask_l)
        nb = h0_ref.shape[1] // nbk

        # per-graph h0 sums (membership one-hot matmuls per node block)
        s_ref[:] = jnp.zeros_like(s_ref)
        for j in range(nb):
            g0 = pl.multiple_of(g0_ref[j], 128)
            ngb = ng_ref[0, j * nbk:(j + 1) * nbk]
            og = (ngb[:, None] == g0 + jax.lax.broadcasted_iota(
                jnp.int32, (nbk, gw), 1)).astype(dt)
            h0b = h0_ref[:, j * nbk:(j + 1) * nbk]
            s_ref[:, pl.ds(g0, gw)] += _dot(h0b, og)
        # s no longer needed in the forward: overwrite in place with
        # A0 @ s so the per-block reads below can ref-slice it
        s_ref[:] = _dot(a0_ref[:], s_ref[:])                  # (fp, gp)
        for j in range(nb):
            g0 = pl.multiple_of(g0_ref[j], 128)
            ngb = ng_ref[0, j * nbk:(j + 1) * nbk]
            og = (ngb[:, None] == g0 + jax.lax.broadcasted_iota(
                jnp.int32, (nbk, gw), 1)).astype(dt)
            msgs[:, j * nbk:(j + 1) * nbk] += \
                _dot(s_ref[:, pl.ds(g0, gw)], og.T)

        msgs_m = (msgs[:] + mbias_ref[:]) * mask_l
        mbv, ma_mean, ma_var = _bn_fwd_t(msgs_m, mask_l, mw_ref[:],
                                         mb_ref[:], c)
        ma_mean_out[:] = ma_mean
        ma_var_out[:] = ma_var
        gr = _dot(wir_ref[:].T, mbv) + bir_ref[:]
        gz = _dot(wiz_ref[:].T, mbv) + biz_ref[:]
        gn = _dot(win2_ref[:].T, mbv) + bin_ref[:]
        h = h0_ref[:] * mask_l
        for t in range(steps):
            h = _gru_fwd_t(h, gr, gz, gn, whr_ref[:], whz_ref[:],
                           whn_ref[:], bhr_ref[:], bhz_ref[:], bhn_ref[:],
                           mask_l)
            h, mean, var = _bn_fwd_t(h, mask_l, sw_ref[:], sb_ref[:], c)
            bn_mean_out[t * fp:(t + 1) * fp, :] = mean
            bn_var_out[t * fp:(t + 1) * fp, :] = var
        h_out[:] = h

        # gated graph-level readout + masked MSE loss
        odm = odm_ref[:]                                      # (odp, 1)
        neg = (1.0 - odm) * _BIG_NEG
        out_t[:] = jnp.zeros_like(out_t)
        for j in range(nb):
            g0 = pl.multiple_of(g0_ref[j], 128)
            ngb = ng_ref[0, j * nbk:(j + 1) * nbk]
            og = (ngb[:, None] == g0 + jax.lax.broadcasted_iota(
                jnp.int32, (nbk, gw), 1)).astype(dt)
            hb = h[:, j * nbk:(j + 1) * nbk]
            h0b = h0_ref[:, j * nbk:(j + 1) * nbk] \
                * mask_l[:, j * nbk:(j + 1) * nbk]
            pi = _dot(wi1_ref[:], hb) + _dot(wi2_ref[:], h0b) \
                + bri_ref[:] + neg
            pj = _dot(wj1_ref[:], hb) + _dot(wj2_ref[:], h0b) + brj_ref[:]
            ex = jnp.exp(pi - jnp.max(pi, axis=0, keepdims=True)) * odm
            sm = ex / jnp.sum(ex, axis=0, keepdims=True)
            gated = sm * pj * mask_l[:, j * nbk:(j + 1) * nbk]
            out_t[:, pl.ds(g0, gw)] += _dot(gated, og)
        diff = out_t[:] - y_ref[:]
        per = diff * diff * gm_ref[:] * odm
        loss_out[:] = (jnp.sum(per) / jnp.sum(gm_ref[:])).reshape(1, 1)


# ---------------------------------------------------------------------------
# backward kernel: grid (nblk [SpMM replay] + 1 [chain] + nblk [SpMM bwd])
# ---------------------------------------------------------------------------

def _bwd_kernel(win_ref, g0_ref, src_ref, dst_ref, vid_ref,
                a2t_ref, a2tt_ref, a0_ref, mbias_ref, h0_ref, mask_ref,
                ng_ref,
                wir_ref, wiz_ref, win2_ref, whr_ref, whz_ref, whn_ref,
                bir_ref, biz_ref, bin_ref, bhr_ref, bhz_ref, bhn_ref,
                mw_ref, mb_ref, sw_ref, sb_ref,
                wi1_ref, wi2_ref, wj1_ref, wj2_ref, bri_ref, brj_ref,
                odm_ref, y_ref, gm_ref, gl_ref, gout_ref,
                da2t_out, da0_out, dmbias_out, dh0_out,
                dwir_out, dwiz_out, dwin_out, dwhr_out, dwhz_out, dwhn_out,
                dbir_out, dbiz_out, dbin_out, dbhr_out, dbhz_out, dbhn_out,
                dmw_out, dmb_out, dsw_out, dsb_out,
                dwi1_out, dwi2_out, dwj1_out, dwj2_out, dbri_out, dbrj_out,
                msgs, dmsgs, s_ref, a0s_ref, das_ref, hs_ref, gh_ref,
                outs_ref,
                *, steps: int, f: int, fp: int, kmf: int, kmfp: int,
                be: int, window: int, nblk: int, nbk: int, gw: int):
    p = pl.program_id(0)
    dt = jnp.float32

    @pl.when(p == 0)
    def _():
        msgs[:] = jnp.zeros_like(msgs)
        for ref in (da2t_out, da0_out, dmbias_out, dh0_out,
                    dwir_out, dwiz_out, dwin_out, dwhr_out, dwhz_out,
                    dwhn_out, dbir_out, dbiz_out, dbin_out, dbhr_out,
                    dbhz_out, dbhn_out, dmw_out, dmb_out, dsw_out, dsb_out,
                    dwi1_out, dwi2_out, dwj1_out, dwj2_out, dbri_out,
                    dbrj_out):
            ref[:] = jnp.zeros_like(ref)

    @pl.when(p < nblk)
    def _():
        ws = pl.multiple_of(win_ref[p], 128)
        src = src_ref[p, :] - ws
        dst = dst_ref[p, :] - ws
        vid = vid_ref[p, :]
        oh_src, oh_dst, ohm = _edge_onehots(
            src, dst, vid, be=be, window=window, f=f, kmf=kmf, kmfp=kmfp,
            dtype=dt)
        hw = h0_ref[:, pl.ds(ws, window)]
        hs = _dot(hw, oh_src.T)
        bulk = _dot(a2t_ref[:], hs)
        sel = _sel_t(f, fp, kmf, kmfp, dt)
        me = _dot(sel, ohm * bulk)
        msgs[:, pl.ds(ws, window)] += _dot(me, oh_dst)

    @pl.when(p == nblk)
    def _():
        mask_l = mask_ref[:]
        c = jnp.sum(mask_l)
        nb = h0_ref.shape[1] // nbk
        sel = _sel_t(f, fp, kmf, kmfp, dt)

        def og_at(j):
            g0 = pl.multiple_of(g0_ref[j], 128)
            ngb = ng_ref[0, j * nbk:(j + 1) * nbk]
            return g0, (ngb[:, None] == g0 + jax.lax.broadcasted_iota(
                jnp.int32, (nbk, gw), 1)).astype(dt)

        # ---- replay: base + bias, ma_bn, gates, chain (stash h_{t-1}) ----
        s_ref[:] = jnp.zeros_like(s_ref)
        for j in range(nb):
            g0, og = og_at(j)
            h0b = h0_ref[:, j * nbk:(j + 1) * nbk]
            s_ref[:, pl.ds(g0, gw)] += _dot(h0b, og)
        a0s_ref[:] = _dot(a0_ref[:], s_ref[:])
        for j in range(nb):
            g0, og = og_at(j)
            msgs[:, j * nbk:(j + 1) * nbk] += \
                _dot(a0s_ref[:, pl.ds(g0, gw)], og.T)
        msgs_m = (msgs[:] + mbias_ref[:]) * mask_l
        msgs[:] = msgs_m                      # stash pre-BN input for bwd
        mbv, _, _ = _bn_fwd_t(msgs_m, mask_l, mw_ref[:], mb_ref[:], c)
        gr = _dot(wir_ref[:].T, mbv) + bir_ref[:]
        gz = _dot(wiz_ref[:].T, mbv) + biz_ref[:]
        gn = _dot(win2_ref[:].T, mbv) + bin_ref[:]
        whr = whr_ref[:]
        whz = whz_ref[:]
        whn = whn_ref[:]
        bhr = bhr_ref[:]
        bhz = bhz_ref[:]
        bhn = bhn_ref[:]
        sw = sw_ref[:]
        sb = sb_ref[:]
        h = h0_ref[:] * mask_l
        for t in range(steps):
            hs_ref[t * fp:(t + 1) * fp, :] = h
            h = _gru_fwd_t(h, gr, gz, gn, whr, whz, whn, bhr, bhz, bhn,
                           mask_l)
            h, _, _ = _bn_fwd_t(h, mask_l, sw, sb, c)

        # ---- readout replay + loss gradient ----
        odm = odm_ref[:]
        neg = (1.0 - odm) * _BIG_NEG
        outs_ref[:] = jnp.zeros_like(outs_ref)
        for j in range(nb):
            g0, og = og_at(j)
            mblk = mask_l[:, j * nbk:(j + 1) * nbk]
            hb = h[:, j * nbk:(j + 1) * nbk]
            h0b = h0_ref[:, j * nbk:(j + 1) * nbk] * mblk
            pi = _dot(wi1_ref[:], hb) + _dot(wi2_ref[:], h0b) \
                + bri_ref[:] + neg
            pj = _dot(wj1_ref[:], hb) + _dot(wj2_ref[:], h0b) + brj_ref[:]
            ex = jnp.exp(pi - jnp.max(pi, axis=0, keepdims=True)) * odm
            sm = ex / jnp.sum(ex, axis=0, keepdims=True)
            gated = sm * pj * mblk
            outs_ref[:, pl.ds(g0, gw)] += _dot(gated, og)
        gl = gl_ref[0, 0]
        # out is no longer needed once dout exists: overwrite in place so
        # the per-block reads below can ref-slice it
        outs_ref[:] = gl * 2.0 * (outs_ref[:] - y_ref[:]) * gm_ref[:] \
            * odm / jnp.sum(gm_ref[:]) + gout_ref[:]

        # ---- readout backward (recompute per block) ----
        for j in range(nb):
            g0, og = og_at(j)
            mblk = mask_l[:, j * nbk:(j + 1) * nbk]
            hb = h[:, j * nbk:(j + 1) * nbk]
            h0b = h0_ref[:, j * nbk:(j + 1) * nbk] * mblk
            pi = _dot(wi1_ref[:], hb) + _dot(wi2_ref[:], h0b) \
                + bri_ref[:] + neg
            pj = _dot(wj1_ref[:], hb) + _dot(wj2_ref[:], h0b) + brj_ref[:]
            ex = jnp.exp(pi - jnp.max(pi, axis=0, keepdims=True)) * odm
            sm = ex / jnp.sum(ex, axis=0, keepdims=True)
            dgated = _dot(outs_ref[:, pl.ds(g0, gw)], og.T)    # (odp, nbk)
            djv = dgated * sm * mblk
            dsm = dgated * pj * mblk
            dpi = sm * (dsm - jnp.sum(dsm * sm, axis=0, keepdims=True))
            gh_ref[:, j * nbk:(j + 1) * nbk] = \
                _dot(wi1_ref[:].T, dpi) + _dot(wj1_ref[:].T, djv)
            dh0b = _dot(wi2_ref[:].T, dpi) + _dot(wj2_ref[:].T, djv)
            dh0_out[:, j * nbk:(j + 1) * nbk] += dh0b * mblk
            dwi1_out[:] += _dot(dpi, hb.T)
            dwi2_out[:] += _dot(dpi, h0b.T)
            dwj1_out[:] += _dot(djv, hb.T)
            dwj2_out[:] += _dot(djv, h0b.T)
            dbri_out[:] += jnp.sum(dpi, axis=1, keepdims=True)
            dbrj_out[:] += jnp.sum(djv, axis=1, keepdims=True)

        # ---- chain reverse (identical math to kernels/recurrence.py) ----
        gh = gh_ref[:]
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
            hprev = hs_ref[t * fp:(t + 1) * fp, :]
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
            dhp = dhtil * mask_l
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
                + _dot(wiz_ref[:], da_z) + _dot(win2_ref[:], da_n)
            dwir_acc += _dot(mbv, da_r.T)
            dwiz_acc += _dot(mbv, da_z.T)
            dwin_acc += _dot(mbv, da_n.T)
            dbir_acc += jnp.sum(da_r, axis=1, keepdims=True)
            dbiz_acc += jnp.sum(da_z, axis=1, keepdims=True)
            dbin_acc += jnp.sum(da_n, axis=1, keepdims=True)
            gh = gh_new

        dh0_out[:] += gh * mask_l
        dwir_out[:] += dwir_acc
        dwiz_out[:] += dwiz_acc
        dwin_out[:] += dwin_acc
        dwhr_out[:] += dwhr
        dwhz_out[:] += dwhz
        dwhn_out[:] += dwhn
        dbir_out[:] += dbir_acc
        dbiz_out[:] += dbiz_acc
        dbin_out[:] += dbin_acc
        dbhr_out[:] += dbhr
        dbhz_out[:] += dbhz
        dbhn_out[:] += dbhn
        dsw_out[:] += dsw
        dsb_out[:] += dsb
        dm, dmw, dmbb = _bn_bwd_t(dmb_acc, msgs[:], mask_l, mw_ref[:], c)
        dmw_out[:] += dmw
        dmb_out[:] += dmbb
        dmsgs[:] = dm * mask_l

        # ---- base (A0) and bias backward ----
        das_ref[:] = jnp.zeros_like(das_ref)
        for j in range(nb):
            g0, og = og_at(j)
            das_ref[:, pl.ds(g0, gw)] += \
                _dot(dmsgs[:, j * nbk:(j + 1) * nbk], og)
        da0_out[:] += _dot(das_ref[:], s_ref[:].T)
        # das no longer needed once da0 is accumulated: overwrite in place
        das_ref[:] = _dot(a0_ref[:].T, das_ref[:])
        for j in range(nb):
            g0, og = og_at(j)
            dh0_out[:, j * nbk:(j + 1) * nbk] += \
                _dot(das_ref[:, pl.ds(g0, gw)], og.T)
        dmbias_out[:] += jnp.sum(dmsgs[:], axis=1, keepdims=True)

    @pl.when(p > nblk)
    def _():
        b = p - nblk - 1
        ws = pl.multiple_of(win_ref[b], 128)
        src = src_ref[b, :] - ws
        dst = dst_ref[b, :] - ws
        vid = vid_ref[b, :]
        oh_src, oh_dst, ohm = _edge_onehots(
            src, dst, vid, be=be, window=window, f=f, kmf=kmf, kmfp=kmfp,
            dtype=dt)
        sel = _sel_t(f, fp, kmf, kmfp, dt)
        gwn = dmsgs[:, pl.ds(ws, window)]                     # (fp, W)
        gd = _dot(gwn, oh_dst.T)                              # (fp, BE)
        bulk2 = _dot(a2tt_ref[:], gd)                         # (kmfp, BE)
        dhe = _dot(sel, ohm * bulk2)                          # (fp, BE)
        dh0_out[:, pl.ds(ws, window)] += _dot(dhe, oh_src)
        hw = h0_ref[:, pl.ds(ws, window)]
        hse = _dot(hw, oh_src.T)                              # (fp, BE)
        gdr = _dot(sel.T, gd)                                 # (kmfp, BE)
        da2t_out[:] += _dot(ohm * gdr, hse.T)                 # (kmfp, fp)


# ---------------------------------------------------------------------------
# public custom-VJP op
# ---------------------------------------------------------------------------

def make_fused_step_op(steps: int, f: int, n: int, od: int, n_graphs: int,
                       k_vocab: int, *, block_edges: int = 512,
                       window: int = 512, node_block: int = 512,
                       interpret: bool = False):
    """Whole-step fused op for the flagship config.

    op(amat (K,f,f), a0 (f,f), mbias (f,), h0 (N,f) PRE-MASKED, mask (N,1),
       node_graph (N,) int32, gru, ma_bn, bn, ro {'i':{w,b},'j':{w,b}},
       labels (G,), gmask (G,), vid/src/dst (E,) int32, win (nblk,) int32,
       g0 (NB,) int32)
      -> (loss (), out (G, od), (ma_mean, ma_var), [(mean,var)] x steps)

    Cotangents are honored for loss and out; stats feed running EMAs (their
    cotangents are ignored, as in kernels/recurrence.py). labels/gmask are
    treated as non-differentiable data."""
    npad = _round_up(n, 128)
    fp = _round_up(f, 16)
    odp = _round_up(od, 16)
    gp = _round_up(max(n_graphs, 1), 128)
    kmf = k_vocab * f
    kmfp = _round_up(kmf, 16)
    nbk = node_block
    if npad % nbk:
        for cand in (256, 128):
            if npad % cand == 0:
                nbk = cand
                break
        else:
            raise ValueError(f"npad={npad} not divisible by a node block")
    nb = npad // nbk
    gw = 128
    dt = jnp.float32

    def _vm():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    def pack(amat, a0, mbias, h0, mask, node_graph, gru, ma_bn, bn, ro,
             labels, gmask):
        padf = ((0, 0), (0, fp - f))

        def mat_t(x):
            xt = jnp.pad(x.astype(dt), padf).T
            return xt if npad == n else jnp.pad(xt, ((0, 0), (0, npad - n)))

        def blocks(w):
            b = w.astype(dt).reshape(f, 3, f)
            return [jnp.pad(b[:, i, :], ((0, fp - f), (0, fp - f)))
                    for i in range(3)]

        def col3(v):
            b = v.astype(dt).reshape(3, f)
            return [jnp.pad(b[i][:, None], ((0, fp - f), (0, 0)))
                    for i in range(3)]

        def col(v):
            return jnp.pad(v.astype(dt)[:, None], ((0, fp - f), (0, 0)))

        a2t = jnp.pad(amat.astype(dt).reshape(kmf, f),
                      ((0, kmfp - kmf), (0, fp - f)))
        a2tt = jnp.pad(jnp.transpose(amat.astype(dt), (0, 2, 1))
                       .reshape(kmf, f), ((0, kmfp - kmf), (0, fp - f)))
        a0p = jnp.pad(a0.astype(dt), ((0, fp - f), (0, fp - f)))
        mask_row = jnp.pad(mask.astype(dt).reshape(1, n),
                           ((0, 0), (0, npad - n)))
        ng_row = jnp.pad(node_graph.astype(jnp.int32).reshape(1, n),
                         ((0, 0), (0, npad - n)),
                         constant_values=n_graphs)
        wi = blocks(gru["w_ih"])
        wh = blocks(gru["w_hh"])
        bi = col3(gru["b_ih"])
        bh = col3(gru["b_hh"])

        def ro_w(w):                     # (2f, od) -> two (odp, fp)
            wt = w.astype(dt)
            return (jnp.pad(wt[:f].T, ((0, odp - od), (0, fp - f))),
                    jnp.pad(wt[f:].T, ((0, odp - od), (0, fp - f))))

        wi1, wi2 = ro_w(ro["i"]["w"])
        wj1, wj2 = ro_w(ro["j"]["w"])
        bri = jnp.pad(ro["i"]["b"].astype(dt)[:, None],
                      ((0, odp - od), (0, 0)))
        brj = jnp.pad(ro["j"]["b"].astype(dt)[:, None],
                      ((0, odp - od), (0, 0)))
        odm = (jax.lax.broadcasted_iota(jnp.int32, (odp, 1), 0)
               < od).astype(dt)
        y_row = jnp.pad(labels.astype(dt).reshape(1, n_graphs),
                        ((0, 0), (0, gp - n_graphs)))
        gm_row = jnp.pad(gmask.astype(dt).reshape(1, n_graphs),
                         ((0, 0), (0, gp - n_graphs)))
        common = [a2t, a0p, col(mbias), mat_t(h0), mask_row, ng_row] \
            + wi + wh + bi + bh \
            + [col(ma_bn["weight"]), col(ma_bn["bias"]),
               col(bn["weight"]), col(bn["bias"]),
               wi1, wi2, wj1, wj2, bri, brj, odm, y_row, gm_row]
        return common, a2tt

    def pack_edges(vid, src, dst):
        e = src.shape[0]
        nblk = _round_up(e, block_edges) // block_edges
        ep = nblk * block_edges

        def padr(x, fill=0):
            if x.shape[0] != ep:
                x = jnp.concatenate(
                    [x, jnp.full((ep - x.shape[0],), fill, x.dtype)])
            return x.reshape(nblk, block_edges)
        # grid-padding edges get src/dst -1: out of every window, so they
        # can never alias node 0 (unlike batch-level pad edges, whose
        # vocab id maps to the zero matrix)
        return padr(src, -1), padr(dst, -1), padr(vid), nblk

    @jax.custom_vjp
    def op(amat, a0, mbias, h0, mask, node_graph, gru, ma_bn, bn, ro,
           labels, gmask, vid, src, dst, win, g0):
        common, _ = pack(amat, a0, mbias, h0, mask, node_graph, gru,
                         ma_bn, bn, ro, labels, gmask)
        src2, dst2, vid2, nblk = pack_edges(vid, src, dst)
        kernel = functools.partial(
            _fwd_kernel, steps=steps, f=f, fp=fp, kmf=kmf, kmfp=kmfp,
            be=block_edges, window=window, nblk=nblk, nbk=nbk, gw=gw)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nblk + 1,),
            in_specs=[_vm()] * (3 + len(common)),
            out_specs=tuple([_vm()] * 7),
            scratch_shapes=[
                pltpu.VMEM((fp, npad), dt),        # msgs
                pltpu.VMEM((fp, gp), dt),          # per-graph h0 sums
            ],
        )
        loss, out_t, h_t, ma_m, ma_v, bn_m, bn_v = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((1, 1), dt),
                jax.ShapeDtypeStruct((odp, gp), dt),
                jax.ShapeDtypeStruct((fp, npad), dt),
                jax.ShapeDtypeStruct((fp, 1), dt),
                jax.ShapeDtypeStruct((fp, 1), dt),
                jax.ShapeDtypeStruct((steps * fp, 1), dt),
                jax.ShapeDtypeStruct((steps * fp, 1), dt),
            ),
            interpret=interpret,
        )(win, g0, src2, dst2, vid2, *common)
        dtt = h0.dtype
        ma_stats = (ma_m[:f, 0].astype(dtt), ma_v[:f, 0].astype(dtt))
        step_stats = [(bn_m[t * fp:t * fp + f, 0].astype(dtt),
                       bn_v[t * fp:t * fp + f, 0].astype(dtt))
                      for t in range(steps)]
        return (loss[0, 0].astype(dtt), out_t[:od, :n_graphs].T.astype(dtt),
                ma_stats, step_stats)

    def fwd(amat, a0, mbias, h0, mask, node_graph, gru, ma_bn, bn, ro,
            labels, gmask, vid, src, dst, win, g0):
        res = (amat, a0, mbias, h0, mask, node_graph, gru, ma_bn, bn, ro,
               labels, gmask, vid, src, dst, win, g0)
        return op(*res), res

    def bwd(res, cot):
        (amat, a0, mbias, h0, mask, node_graph, gru, ma_bn, bn, ro,
         labels, gmask, vid, src, dst, win, g0) = res
        gl, gout, _, _ = cot          # stats feed EMAs only (no grad)
        common, a2tt = pack(amat, a0, mbias, h0, mask, node_graph, gru,
                            ma_bn, bn, ro, labels, gmask)
        src2, dst2, vid2, nblk = pack_edges(vid, src, dst)
        gl2 = jnp.asarray(gl, dt).reshape(1, 1)
        gout_t = jnp.pad(gout.astype(dt).T,
                         ((0, odp - od), (0, gp - n_graphs)))
        kernel = functools.partial(
            _bwd_kernel, steps=steps, f=f, fp=fp, kmf=kmf, kmfp=kmfp,
            be=block_edges, window=window, nblk=nblk, nbk=nbk, gw=gw)
        fpf = jax.ShapeDtypeStruct((fp, fp), dt)
        fc = jax.ShapeDtypeStruct((fp, 1), dt)
        rw = jax.ShapeDtypeStruct((odp, fp), dt)
        rc = jax.ShapeDtypeStruct((odp, 1), dt)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(2 * nblk + 1,),
            in_specs=[_vm()] * (3 + 1 + len(common) + 2),
            out_specs=tuple([_vm()] * 26),
            scratch_shapes=[
                pltpu.VMEM((fp, npad), dt),        # msgs (then pre-BN input)
                pltpu.VMEM((fp, npad), dt),        # dmsgs
                pltpu.VMEM((fp, gp), dt),          # s
                pltpu.VMEM((fp, gp), dt),          # A0 @ s
                pltpu.VMEM((fp, gp), dt),          # das (then a0^T das)
                pltpu.VMEM((steps * fp, npad), dt),  # stashed h_{t-1}
                pltpu.VMEM((fp, npad), dt),        # readout dh
                pltpu.VMEM((odp, gp), dt),         # recomputed out -> dout
            ],
        )
        ins = [common[0], a2tt] + common[1:] + [gl2, gout_t]
        outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((kmfp, fp), dt),   # da2t
                fpf,                                    # da0
                fc,                                     # dmbias
                jax.ShapeDtypeStruct((fp, npad), dt),   # dh0
                fpf, fpf, fpf, fpf, fpf, fpf,           # dgru weights
                fc, fc, fc, fc, fc, fc,                 # dgru biases
                fc, fc, fc, fc,                         # dmw dmb dsw dsb
                rw, rw, rw, rw, rc, rc,                 # readout grads
            ),
            interpret=interpret,
        )(win, g0, src2, dst2, vid2, *ins)
        (da2t, da0p, dmbias, dh0t, dwir, dwiz, dwin_, dwhr, dwhz, dwhn,
         dbir, dbiz, dbin_, dbhr, dbhz, dbhn, dmw, dmbb, dsw, dsb,
         dwi1, dwi2, dwj1, dwj2, dbri, dbrj) = outs

        damat = da2t[:kmf, :f].reshape(k_vocab, f, f).astype(amat.dtype)

        def unblocks(wsx):
            return jnp.stack([w[:f, :f] for w in wsx], axis=1) \
                .reshape(f, 3 * f)

        def uncol3(cs):
            return jnp.concatenate([cv[:f, 0] for cv in cs])

        dgru = {
            "w_ih": unblocks([dwir, dwiz, dwin_]).astype(gru["w_ih"].dtype),
            "w_hh": unblocks([dwhr, dwhz, dwhn]).astype(gru["w_hh"].dtype),
            "b_ih": uncol3([dbir, dbiz, dbin_]).astype(gru["b_ih"].dtype),
            "b_hh": uncol3([dbhr, dbhz, dbhn]).astype(gru["b_hh"].dtype),
        }
        dma = {"weight": dmw[:f, 0].astype(ma_bn["weight"].dtype),
               "bias": dmbb[:f, 0].astype(ma_bn["bias"].dtype)}
        dbn = {"weight": dsw[:f, 0].astype(bn["weight"].dtype),
               "bias": dsb[:f, 0].astype(bn["bias"].dtype)}
        dro = {"i": {"w": jnp.concatenate(
                        [dwi1[:od, :f].T, dwi2[:od, :f].T], axis=0)
                        .astype(ro["i"]["w"].dtype),
                     "b": dbri[:od, 0].astype(ro["i"]["b"].dtype)},
               "j": {"w": jnp.concatenate(
                        [dwj1[:od, :f].T, dwj2[:od, :f].T], axis=0)
                        .astype(ro["j"]["w"].dtype),
                     "b": dbrj[:od, 0].astype(ro["j"]["b"].dtype)}}
        return (damat, da0p[:f, :f].astype(a0.dtype),
                dmbias[:f, 0].astype(mbias.dtype),
                dh0t[:f, :n].T.astype(h0.dtype), None, None,
                dgru, dma, dbn, dro, None, None, None, None, None, None,
                None)

    op.defvjp(fwd, bwd)
    return op
