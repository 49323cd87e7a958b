"""Pallas TPU SDDMM: fused attention-gated message+aggregate step.

The attention message family (reference
mpnn_functions/message/att_edge_network.py:18-31) computes PER-EDGE
attention logits from the (dst-node, edge) pair — a sampled dense-dense
matmul (SDDMM) — then gates the source features and applies the edge
matrix:

    gate_e = softmax_feat( W_a · [h_dst_e ‖ e_e] + b_a )
    g_e    = gate_e ⊙ h_src_e
    msg_e  = A'_{vid_e} · g_e          A'_k = Σ_p pen_k[p]·W̃[p] + B_f
    out[d] = Σ_{e: dst_e = d} msg_e

This kernel fuses ALL of it per edge block with the same windowed one-hot
machinery as kernels/spmm.py (gather/scatter as MXU matmuls against a
node window; the packed layout keeps each block's endpoints local). The
edge features are read from the VOCAB table (attach_edge_vocab) — one row
per distinct bond-feature vector.

Backward (bwd='kernel', default): ONE Pallas pass per edge block that
recomputes the forward internals in-window (gate, g) and emits all six
gradients — dh accumulated through window DMAs in HBM (src AND dst
scatter), dA'/dW_a/db_a/devocab accumulated in VMEM outputs across the
sequential grid, the softmax backward in closed form per edge. The
feature axes ride a 128-lane panel; the softmax is confined to the real
nf lanes by a −1e30 bias pad. bwd='xla' keeps the old behavior (jax.vjp
of the XLA reference restatement — exact same math, gather-heavy).

Parity: tests/test_kernels.py::TestSddmm (interpret mode) against
spmm_att_reference / models/sparse.py::sparse_att_edge_network semantics,
both directions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpnn_tpu.kernels.spmm import _pad_edges, _round_up


def _sddmm_kernel(win_ref, src_ref, dst_ref, vid_ref, evocab_ref,
                  wa_h_ref, wa_e_ref, ba_ref, a2_ref, h_ref, out_ref,
                  *, window: int, kmats: int, mf: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ws = pl.multiple_of(win_ref[i], 16)
    be = src_ref.shape[1]
    kmf = kmats * mf
    dtype = h_ref.dtype
    hw = h_ref[pl.ds(ws, window), :]                        # (W, nf)
    src = src_ref[i, :] - ws
    dst = dst_ref[i, :] - ws
    vid = vid_ref[i, :]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (be, window), 1)
    oh_src = (iota_w == src[:, None]).astype(dtype)
    oh_dst = (iota_w == dst[:, None]).astype(dtype)
    hs = jnp.dot(oh_src, hw, preferred_element_type=jnp.float32).astype(dtype)   # (BE, nf)
    hd = jnp.dot(oh_dst, hw, preferred_element_type=jnp.float32).astype(dtype)   # (BE, nf)
    # per-edge raw features from the vocab table (one-hot over K ids)
    oh_vid_k = (jax.lax.broadcasted_iota(jnp.int32, (be, kmats), 1)
                == vid[:, None]).astype(dtype)
    ev = jnp.dot(oh_vid_k, evocab_ref[:],
                 preferred_element_type=jnp.float32).astype(dtype)               # (BE, ef)
    # SDDMM: logits over the nf features, softmaxed per edge
    logits = (jnp.dot(hd, wa_h_ref[:], preferred_element_type=jnp.float32).astype(dtype)
              + jnp.dot(ev, wa_e_ref[:], preferred_element_type=jnp.float32).astype(dtype)
              + ba_ref[:])
    gate = jax.nn.softmax(logits, axis=-1)                   # (BE, nf)
    g = gate * hs
    bulk = jnp.dot(g, a2_ref[:], preferred_element_type=jnp.float32).astype(dtype)  # (BE, K·mf)
    lane = jax.lax.broadcasted_iota(jnp.int32, (be, kmf), 1)
    ohm = (lane // mf == vid[:, None]).astype(dtype)
    sel = (jax.lax.broadcasted_iota(jnp.int32, (kmf, mf), 0) % mf
           == jax.lax.broadcasted_iota(jnp.int32, (kmf, mf), 1)
           ).astype(dtype)
    msgs = jnp.dot(ohm * bulk, sel, preferred_element_type=jnp.float32).astype(dtype)
    contrib = jnp.dot(oh_dst.T, msgs, preferred_element_type=jnp.float32).astype(dtype)
    cur = out_ref[pl.ds(ws, window), :]
    out_ref[pl.ds(ws, window), :] = cur + contrib


def _sddmm_fwd(aprime, evocab, wa, ba, h, vid, src, dst, win_start, *,
               block_edges: int, window: int, interpret: bool = False):
    """aprime (K, mf, nf); evocab (K, ef); wa (nf+ef, nf); ba (nf,);
    h (N, nf) → (N, mf)."""
    k, mf, nf = aprime.shape
    n = h.shape[0]
    e = src.shape[0]
    nblk = _round_up(e, block_edges) // block_edges
    ep = nblk * block_edges
    a2 = jnp.transpose(aprime, (2, 0, 1)).reshape(nf, k * mf)
    wa_h = wa[:nf]                           # attn rows for h_dst
    wa_e = wa[nf:]                           # attn rows for edge feats
    # grid-pad edges get src/dst -1 (outside every window's one-hot):
    # unlike the SpMM kernels, vocab row 0 here (A'_0 = pen(0)-fold + bias)
    # is NONZERO, so a zero-padded edge would add spurious messages to
    # real node 0 in forward AND backward
    src2 = _pad_edges(src, ep, fill=-1).reshape(nblk, block_edges)
    dst2 = _pad_edges(dst, ep, fill=-1).reshape(nblk, block_edges)
    vid2 = _pad_edges(vid, ep).reshape(nblk, block_edges)

    kernel = functools.partial(_sddmm_kernel, window=window, kmats=k, mf=mf)
    full = lambda shape: pl.BlockSpec(shape, lambda i, w: tuple(
        0 for _ in shape), memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=[
            full((nblk, block_edges)), full((nblk, block_edges)),
            full((nblk, block_edges)), full(evocab.shape),
            full(wa_h.shape), full(wa_e.shape),
            full((1, ba.shape[0])), full(a2.shape), full(h.shape),
        ],
        out_specs=full((n, mf)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, mf), h.dtype),
        interpret=interpret,
    )(win_start, src2, dst2, vid2, evocab, wa_h, wa_e,
      ba.reshape(1, -1), a2, h)


def _sddmm_bwd_kernel(win_ref, src_ref, dst_ref, vid_ref, evocab_ref,
                      wa_h_ref, wa_e_ref, ba_ref, a2t_ref, h_hbm, g_hbm,
                      zero_ref,
                      dh_hbm, da_ref, dwh_ref, dwe_ref, dba_ref, dev_ref,
                      hw, gw, dhw, sems,
                      *, window: int, kmats: int, mf: int, nf: int,
                      lanes: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        da_ref[:] = jnp.zeros_like(da_ref)
        dwh_ref[:] = jnp.zeros_like(dwh_ref)
        dwe_ref[:] = jnp.zeros_like(dwe_ref)
        dba_ref[:] = jnp.zeros_like(dba_ref)
        dev_ref[:] = jnp.zeros_like(dev_ref)

    ws = pl.multiple_of(win_ref[i], 16)
    be = src_ref.shape[1]
    kmf = kmats * mf
    knf = kmats * nf
    dtype = hw.dtype

    cp_h = pltpu.make_async_copy(h_hbm.at[pl.ds(ws, window), :], hw,
                                 sems.at[0])
    cp_g = pltpu.make_async_copy(g_hbm.at[pl.ds(ws, window), :], gw,
                                 sems.at[1])
    cp_d = pltpu.make_async_copy(dh_hbm.at[pl.ds(ws, window), :], dhw,
                                 sems.at[2])
    cp_h.start()
    cp_g.start()
    cp_d.start()

    src = src_ref[i, :] - ws
    dst = dst_ref[i, :] - ws
    vid = vid_ref[i, :]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (be, window), 1)
    oh_src = (iota_w == src[:, None]).astype(dtype)
    oh_dst = (iota_w == dst[:, None]).astype(dtype)
    oh_vid_k = (jax.lax.broadcasted_iota(jnp.int32, (be, kmats), 1)
                == vid[:, None]).astype(dtype)

    cp_h.wait()
    hs = jnp.dot(oh_src, hw[:], preferred_element_type=jnp.float32
                 ).astype(dtype)                                  # (BE, L)
    hd = jnp.dot(oh_dst, hw[:], preferred_element_type=jnp.float32
                 ).astype(dtype)                                  # (BE, L)
    ev = jnp.dot(oh_vid_k, evocab_ref[:],
                 preferred_element_type=jnp.float32).astype(dtype)  # (BE, L)
    # forward recompute: logits confined to the nf real lanes by the −1e30
    # bias pad → softmax mass 0 on padding
    logits = (jnp.dot(hd, wa_h_ref[:], preferred_element_type=jnp.float32
                      ).astype(dtype)
              + jnp.dot(ev, wa_e_ref[:],
                        preferred_element_type=jnp.float32).astype(dtype)
              + ba_ref[:])
    gate = jax.nn.softmax(logits, axis=-1)                        # (BE, L)
    g = gate * hs

    cp_g.wait()
    gd = jnp.dot(oh_dst, gw[:], preferred_element_type=jnp.float32
                 ).astype(dtype)                                  # (BE, L)
    # dA'[k] += Σ_{vid_e=k} dmsg_e ⊗ g_e   (same gk trick as spmm's dA)
    lane_m = jax.lax.broadcasted_iota(jnp.int32, (be, kmf), 1)
    ohm_m = (lane_m // mf == vid[:, None]).astype(dtype)
    sel_m = (jax.lax.broadcasted_iota(jnp.int32, (kmf, lanes), 0) % mf
             == jax.lax.broadcasted_iota(jnp.int32, (kmf, lanes), 1)
             ).astype(dtype)
    gdr = jnp.dot(gd, sel_m.T, preferred_element_type=jnp.float32
                  ).astype(dtype)                                 # (BE, K·mf)
    gk = ohm_m * gdr
    da_ref[:] += jnp.dot(gk.T, g, preferred_element_type=jnp.float32
                         ).astype(dtype)                          # (K·mf, L)
    # dg = A'[vid]ᵀ · dmsg  via the transposed-bulk trick
    lane_n = jax.lax.broadcasted_iota(jnp.int32, (be, knf), 1)
    ohm_n = (lane_n // nf == vid[:, None]).astype(dtype)
    sel_n = (jax.lax.broadcasted_iota(jnp.int32, (knf, lanes), 0) % nf
             == jax.lax.broadcasted_iota(jnp.int32, (knf, lanes), 1)
             ).astype(dtype)
    bulk_t = jnp.dot(gd, a2t_ref[:], preferred_element_type=jnp.float32
                     ).astype(dtype)                              # (BE, K·nf)
    dg = jnp.dot(ohm_n * bulk_t, sel_n,
                 preferred_element_type=jnp.float32).astype(dtype)  # (BE, L)
    dgate = dg * hs
    dhs = dg * gate
    # softmax backward (padding lanes carry gate = 0 → no contribution)
    dlog = gate * (dgate - jnp.sum(gate * dgate, axis=1, keepdims=True))
    dhd = jnp.dot(dlog, wa_h_ref[:].T,
                  preferred_element_type=jnp.float32).astype(dtype)
    dev = jnp.dot(dlog, wa_e_ref[:].T,
                  preferred_element_type=jnp.float32).astype(dtype)
    dwh_ref[:] += jnp.dot(hd.T, dlog,
                          preferred_element_type=jnp.float32).astype(dtype)
    dwe_ref[:] += jnp.dot(ev.T, dlog,
                          preferred_element_type=jnp.float32).astype(dtype)
    dba_ref[:] += jnp.sum(dlog, axis=0, keepdims=True)
    dev_ref[:] += jnp.dot(oh_vid_k.T, dev,
                          preferred_element_type=jnp.float32).astype(dtype)
    contrib = jnp.dot(oh_src.T, dhs, preferred_element_type=jnp.float32
                      ).astype(dtype) \
        + jnp.dot(oh_dst.T, dhd,
                  preferred_element_type=jnp.float32).astype(dtype)
    cp_d.wait()
    dhw[:] = dhw[:] + contrib
    wb = pltpu.make_async_copy(dhw, dh_hbm.at[pl.ds(ws, window), :],
                               sems.at[2])
    wb.start()
    wb.wait()


def _sddmm_bwd(aprime, evocab, wa, ba, h, vid, src, dst, win_start, gout,
               *, block_edges: int, window: int, interpret: bool = False,
               lanes: int = 128):
    """Fused backward: returns (da, devocab, dwa, dba, dh)."""
    k, mf, nf = aprime.shape
    ef = evocab.shape[1]
    n = h.shape[0]
    e = src.shape[0]
    nblk = _round_up(e, block_edges) // block_edges
    ep = nblk * block_edges
    a2t = jnp.transpose(aprime, (1, 0, 2)).reshape(mf, k * nf)
    a2t = jnp.pad(a2t, ((0, lanes - mf), (0, 0)))       # (L, K·nf)
    evp = jnp.pad(evocab, ((0, 0), (0, lanes - ef)))    # (K, L)
    wa_h = jnp.pad(wa[:nf], ((0, lanes - nf), (0, lanes - nf)))
    wa_e = jnp.pad(wa[nf:], ((0, lanes - ef), (0, lanes - nf)))
    bap = jnp.pad(ba.reshape(1, -1), ((0, 0), (0, lanes - nf)),
                  constant_values=-1e30)
    hp = jnp.pad(h, ((0, 0), (0, lanes - nf)))
    gp = jnp.pad(gout, ((0, 0), (0, lanes - mf)))
    zeros = jnp.zeros((n, lanes), h.dtype)
    # grid-pad edges get src/dst -1 (outside every window's one-hot):
    # unlike the SpMM kernels, vocab row 0 here (A'_0 = pen(0)-fold + bias)
    # is NONZERO, so a zero-padded edge would add spurious messages to
    # real node 0 in forward AND backward
    src2 = _pad_edges(src, ep, fill=-1).reshape(nblk, block_edges)
    dst2 = _pad_edges(dst, ep, fill=-1).reshape(nblk, block_edges)
    vid2 = _pad_edges(vid, ep).reshape(nblk, block_edges)

    kernel = functools.partial(_sddmm_bwd_kernel, window=window, kmats=k,
                               mf=mf, nf=nf, lanes=lanes)
    full = lambda shape: pl.BlockSpec(shape, lambda i, w: tuple(
        0 for _ in shape), memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=[
            full((nblk, block_edges)), full((nblk, block_edges)),
            full((nblk, block_edges)), full(evp.shape),
            full(wa_h.shape), full(wa_e.shape), full(bap.shape),
            full(a2t.shape),
            pl.BlockSpec(memory_space=pltpu.ANY),      # h in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),      # gout in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),      # zero-init of dh
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.ANY),
                   full((k * mf, lanes)), full((lanes, lanes)),
                   full((lanes, lanes)), full((1, lanes)),
                   full((k, lanes))),
        scratch_shapes=[
            pltpu.VMEM((window, lanes), h.dtype),
            pltpu.VMEM((window, lanes), h.dtype),
            pltpu.VMEM((window, lanes), h.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    dh_p, da2, dwh, dwe, dba_p, dev_p = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((n, lanes), h.dtype),
                   jax.ShapeDtypeStruct((k * mf, lanes), h.dtype),
                   jax.ShapeDtypeStruct((lanes, lanes), h.dtype),
                   jax.ShapeDtypeStruct((lanes, lanes), h.dtype),
                   jax.ShapeDtypeStruct((1, lanes), h.dtype),
                   jax.ShapeDtypeStruct((k, lanes), h.dtype)),
        input_output_aliases={11: 0},
        interpret=interpret,
    )(win_start, src2, dst2, vid2, evp, wa_h, wa_e, bap, a2t, hp, gp,
      zeros)
    da = da2[:, :nf].reshape(k, mf, nf)
    dwa = jnp.concatenate([dwh[:nf, :nf], dwe[:ef, :nf]], axis=0)
    return da, dev_p[:, :ef], dwa, dba_p[0, :nf], dh_p[:, :nf]


# ---------------------------------------------------------------------------
# TRANSPOSED layout (features in sublanes, nodes in lanes) — the economics
# that made the fused-step edge phase win: the row-layout kernels above pad
# every per-edge tensor to a 128-lane feature panel (10 real features →
# 92% wasted MXU work), which is why they measured SLOWER than XLA
# end-to-end. Here everything is (fp=round16(f), ·): gather/scatter are
# (fp, W)·(W, BE) one-hot matmuls, the per-edge softmax runs over the
# SUBLANE axis (padding rows carry −1e30 bias → zero mass), and the whole
# VMEM footprint is h (fp, npad) ≈ 844 KB at bench sizes.
# ---------------------------------------------------------------------------

def _sddmm_t_kernel(win_ref, src_ref, dst_ref, vid_ref,
                    evt_ref, wah_ref, wae_ref, ba_ref, a2t_ref, h_ref,
                    out_ref,
                    *, window: int, kmats: int, f: int, fp: int,
                    kmf: int, kmfp: int, kp: int):
    i = pl.program_id(0)
    dt = jnp.float32

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ws = pl.multiple_of(win_ref[i], 128)
    be = src_ref.shape[1]
    src = src_ref[i, :] - ws
    dst = dst_ref[i, :] - ws
    vid = vid_ref[i, :]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (be, window), 1)
    oh_src = (iota_w == src[:, None]).astype(dt)
    oh_dst = (iota_w == dst[:, None]).astype(dt)
    ohk = (jax.lax.broadcasted_iota(jnp.int32, (kp, be), 0)
           == vid[None, :]).astype(dt)                       # (Kp, BE)
    hw = h_ref[:, pl.ds(ws, window)]                         # (fp, W)
    hs = jnp.dot(hw, oh_src.T, preferred_element_type=dt)    # (fp, BE)
    hd = jnp.dot(hw, oh_dst.T, preferred_element_type=dt)
    ev = jnp.dot(evt_ref[:], ohk, preferred_element_type=dt)  # (efp, BE)
    logits = (jnp.dot(wah_ref[:], hd, preferred_element_type=dt)
              + jnp.dot(wae_ref[:], ev, preferred_element_type=dt)
              + ba_ref[:])                                   # (fp, BE)
    gate = jax.nn.softmax(logits, axis=0)   # pad rows: −1e30 → zero mass
    g = gate * hs
    bulk = jnp.dot(a2t_ref[:], g, preferred_element_type=dt)  # (kmfp, BE)
    row = jax.lax.broadcasted_iota(jnp.int32, (kmfp, be), 0)
    ohm = jnp.logical_and(row // f == vid[None, :], row < kmf).astype(dt)
    sel = jnp.logical_and(
        jax.lax.broadcasted_iota(jnp.int32, (fp, kmfp), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (fp, kmfp), 1) % f,
        jnp.logical_and(
            jax.lax.broadcasted_iota(jnp.int32, (fp, kmfp), 0) < f,
            jax.lax.broadcasted_iota(jnp.int32, (fp, kmfp), 1) < kmf)
    ).astype(dt)
    me = jnp.dot(sel, ohm * bulk, preferred_element_type=dt)  # (fp, BE)
    out_ref[:, pl.ds(ws, window)] += jnp.dot(
        me, oh_dst, preferred_element_type=dt)


def _sddmm_t_bwd_kernel(win_ref, src_ref, dst_ref, vid_ref,
                        evt_ref, wah_ref, wae_ref, ba_ref,
                        a2t_ref, a2tt_ref, h_ref, gout_ref,
                        dh_out, da2t_out, dwh_out, dwe_out, dba_out,
                        dev_out,
                        *, window: int, kmats: int, f: int, fp: int,
                        efp: int, kmf: int, kmfp: int, kp: int):
    i = pl.program_id(0)
    dt = jnp.float32

    @pl.when(i == 0)
    def _():
        dh_out[:] = jnp.zeros_like(dh_out)
        da2t_out[:] = jnp.zeros_like(da2t_out)
        dwh_out[:] = jnp.zeros_like(dwh_out)
        dwe_out[:] = jnp.zeros_like(dwe_out)
        dba_out[:] = jnp.zeros_like(dba_out)
        dev_out[:] = jnp.zeros_like(dev_out)

    ws = pl.multiple_of(win_ref[i], 128)
    be = src_ref.shape[1]
    src = src_ref[i, :] - ws
    dst = dst_ref[i, :] - ws
    vid = vid_ref[i, :]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (be, window), 1)
    oh_src = (iota_w == src[:, None]).astype(dt)
    oh_dst = (iota_w == dst[:, None]).astype(dt)
    ohk = (jax.lax.broadcasted_iota(jnp.int32, (kp, be), 0)
           == vid[None, :]).astype(dt)
    hw = h_ref[:, pl.ds(ws, window)]
    hs = jnp.dot(hw, oh_src.T, preferred_element_type=dt)
    hd = jnp.dot(hw, oh_dst.T, preferred_element_type=dt)
    ev = jnp.dot(evt_ref[:], ohk, preferred_element_type=dt)
    logits = (jnp.dot(wah_ref[:], hd, preferred_element_type=dt)
              + jnp.dot(wae_ref[:], ev, preferred_element_type=dt)
              + ba_ref[:])
    gate = jax.nn.softmax(logits, axis=0)
    g = gate * hs

    gd = jnp.dot(gout_ref[:, pl.ds(ws, window)], oh_dst.T,
                 preferred_element_type=dt)                  # (fp, BE)
    row = jax.lax.broadcasted_iota(jnp.int32, (kmfp, be), 0)
    ohm = jnp.logical_and(row // f == vid[None, :], row < kmf).astype(dt)
    sel = jnp.logical_and(
        jax.lax.broadcasted_iota(jnp.int32, (fp, kmfp), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (fp, kmfp), 1) % f,
        jnp.logical_and(
            jax.lax.broadcasted_iota(jnp.int32, (fp, kmfp), 0) < f,
            jax.lax.broadcasted_iota(jnp.int32, (fp, kmfp), 1) < kmf)
    ).astype(dt)
    # dA'_k += Σ_{vid_e=k} dmsg_e ⊗ g_e
    gdr = jnp.dot(sel.T, gd, preferred_element_type=dt)      # (kmfp, BE)
    da2t_out[:] += jnp.dot(ohm * gdr, g.T, preferred_element_type=dt)
    # dg = A'[vid]ᵀ · dmsg
    bulk2 = jnp.dot(a2tt_ref[:], gd, preferred_element_type=dt)
    dg = jnp.dot(sel, ohm * bulk2, preferred_element_type=dt)  # (fp, BE)
    dgate = dg * hs
    dhs = dg * gate
    dlog = gate * (dgate - jnp.sum(gate * dgate, axis=0, keepdims=True))
    dhd = jnp.dot(wah_ref[:].T, dlog, preferred_element_type=dt)
    devc = jnp.dot(wae_ref[:].T, dlog, preferred_element_type=dt)
    dwh_out[:] += jnp.dot(dlog, hd.T, preferred_element_type=dt)
    dwe_out[:] += jnp.dot(dlog, ev.T, preferred_element_type=dt)
    dba_out[:] += jnp.sum(dlog, axis=1, keepdims=True)
    dev_out[:] += jnp.dot(devc, ohk.T, preferred_element_type=dt)
    dh_out[:, pl.ds(ws, window)] += \
        jnp.dot(dhs, oh_src, preferred_element_type=dt) \
        + jnp.dot(dhd, oh_dst, preferred_element_type=dt)


def _sddmm_t_pack(aprime, evocab, wa, ba, h, vid, src, dst, *,
                  block_edges):
    k, mf, nf = aprime.shape
    assert mf == nf, "transposed SDDMM shares one feature panel (mf==nf)"
    ef = evocab.shape[1]
    f = nf
    fp = _round_up(f, 16)
    efp = _round_up(ef, 16)
    kp = _round_up(k, 16)
    kmf = k * f
    kmfp = _round_up(kmf, 16)
    n = h.shape[0]
    npad = _round_up(n, 128)
    dt = jnp.float32
    e = src.shape[0]
    nblk = _round_up(e, block_edges) // block_edges
    ep = nblk * block_edges
    a2t = jnp.pad(aprime.astype(dt).reshape(kmf, f),
                  ((0, kmfp - kmf), (0, fp - f)))
    a2tt = jnp.pad(jnp.transpose(aprime.astype(dt), (0, 2, 1))
                   .reshape(kmf, f), ((0, kmfp - kmf), (0, fp - f)))
    evt = jnp.pad(evocab.astype(dt).T, ((0, efp - ef), (0, kp - k)))
    wah = jnp.pad(wa[:f].astype(dt).T, ((0, fp - f), (0, fp - f)))
    wae = jnp.pad(wa[f:].astype(dt).T, ((0, fp - f), (0, efp - ef)))
    ba_col = jnp.pad(ba.astype(dt)[:, None], ((0, fp - f), (0, 0)),
                     constant_values=-1e30)
    ht = jnp.pad(h.astype(dt).T, ((0, fp - f), (0, npad - n)))
    src2 = _pad_edges(src, ep, fill=-1).reshape(nblk, block_edges)
    dst2 = _pad_edges(dst, ep, fill=-1).reshape(nblk, block_edges)
    vid2 = _pad_edges(vid, ep).reshape(nblk, block_edges)
    dims = dict(k=k, f=f, fp=fp, efp=efp, kp=kp, kmf=kmf, kmfp=kmfp,
                n=n, npad=npad, nblk=nblk)
    return (a2t, a2tt, evt, wah, wae, ba_col, ht, src2, dst2, vid2), dims


def _sddmm_t_fwd(aprime, evocab, wa, ba, h, vid, src, dst, win_start, *,
                 block_edges: int, window: int, interpret: bool = False):
    (a2t, _a2tt, evt, wah, wae, ba_col, ht, src2, dst2, vid2), d = \
        _sddmm_t_pack(aprime, evocab, wa, ba, h, vid, src, dst,
                      block_edges=block_edges)
    kernel = functools.partial(
        _sddmm_t_kernel, window=window, kmats=d["k"], f=d["f"],
        fp=d["fp"], kmf=d["kmf"], kmfp=d["kmfp"], kp=d["kp"])
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(d["nblk"],),
        in_specs=[vm] * 9, out_specs=vm)
    out_t = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d["fp"], d["npad"]), jnp.float32),
        interpret=interpret,
    )(win_start, src2, dst2, vid2, evt, wah, wae, ba_col, a2t, ht)
    return out_t[:d["f"], :d["n"]].T.astype(h.dtype)


def _sddmm_t_bwd(aprime, evocab, wa, ba, h, vid, src, dst, win_start,
                 gout, *, block_edges: int, window: int,
                 interpret: bool = False):
    (a2t, a2tt, evt, wah, wae, ba_col, ht, src2, dst2, vid2), d = \
        _sddmm_t_pack(aprime, evocab, wa, ba, h, vid, src, dst,
                      block_edges=block_edges)
    f, fp, efp, kp = d["f"], d["fp"], d["efp"], d["kp"]
    gout_t = jnp.pad(gout.astype(jnp.float32).T,
                     ((0, fp - f), (0, d["npad"] - d["n"])))
    kernel = functools.partial(
        _sddmm_t_bwd_kernel, window=window, kmats=d["k"], f=f, fp=fp,
        efp=efp, kmf=d["kmf"], kmfp=d["kmfp"], kp=kp)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(d["nblk"],),
        in_specs=[vm] * 11, out_specs=tuple([vm] * 6))
    dt = jnp.float32
    dh_t, da2t, dwh, dwe, dba, devt = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((fp, d["npad"]), dt),
                   jax.ShapeDtypeStruct((d["kmfp"], fp), dt),
                   jax.ShapeDtypeStruct((fp, fp), dt),
                   jax.ShapeDtypeStruct((fp, efp), dt),
                   jax.ShapeDtypeStruct((fp, 1), dt),
                   jax.ShapeDtypeStruct((efp, kp), dt)),
        interpret=interpret,
    )(win_start, src2, dst2, vid2, evt, wah, wae, ba_col, a2t, a2tt, ht,
      gout_t)
    k, mf = d["k"], f
    da = da2t[:d["kmf"], :f].reshape(k, mf, f).astype(aprime.dtype)
    # dwh/dwe were accumulated transposed: dwa[i, j] = Σ x_i·dlog_j
    dwa = jnp.concatenate([dwh[:f, :f].T, dwe[:f, :evocab.shape[1]].T],
                          axis=0).astype(wa.dtype)
    dev = devt[:evocab.shape[1], :k].T.astype(evocab.dtype)
    dba_v = dba[:f, 0].astype(ba.dtype)
    dh = dh_t[:f, :d["n"]].T.astype(h.dtype)
    return da, dev, dwa, dba_v, dh


def sddmm_att_reference(aprime, evocab, wa, ba, h, vid, src, dst):
    """XLA reference of the same computation (gather form) — also the
    backward path of the public op."""
    hd = h[dst]
    ev = evocab[vid]
    gate = jax.nn.softmax(
        jnp.concatenate([hd, ev], axis=-1) @ wa + ba, axis=-1)
    g = gate * h[src]
    msgs = jnp.einsum("emn,en->em", aprime[vid], g,
                      preferred_element_type=h.dtype)
    return jax.ops.segment_sum(msgs, dst, num_segments=h.shape[0])


def make_sddmm_op(block_edges: int = 512, window: int = 512,
                  interpret: bool = False, bwd: str = "kernel",
                  layout: str = "rows"):
    """Returns op(aprime, evocab, wa, ba, h, vid, src, dst, win_start) with
    the fused Pallas forward. bwd='kernel' (default): the fused one-pass
    Pallas backward. bwd='xla': VJP of the XLA reference (exact same math,
    gather-heavy).

    layout='rows': per-edge tensors on a 128-lane feature panel (measured
    SLOWER than the XLA att path end-to-end at molecular widths — ~92%
    wasted MXU work at nf=10). layout='t': features in SUBLANES, nodes in
    lanes (the fused-step economics) — requires a 128-aligned window plan
    (attach_spmm_plan(align=128)); window must be a multiple of 128."""
    if layout == "t":
        assert window % 128 == 0, "transposed layout needs 128-mult window"
        fwd_fn = functools.partial(_sddmm_t_fwd, block_edges=block_edges,
                                   window=window, interpret=interpret)
        bwd_fn = functools.partial(_sddmm_t_bwd, block_edges=block_edges,
                                   window=window, interpret=interpret)
    else:
        fwd_fn = functools.partial(_sddmm_fwd, block_edges=block_edges,
                                   window=window, interpret=interpret)
        bwd_fn = functools.partial(_sddmm_bwd, block_edges=block_edges,
                                   window=window, interpret=interpret)

    @jax.custom_vjp
    def op(aprime, evocab, wa, ba, h, vid, src, dst, win_start):
        return fwd_fn(aprime, evocab, wa, ba, h, vid, src, dst, win_start)

    def fwd(aprime, evocab, wa, ba, h, vid, src, dst, win_start):
        out = fwd_fn(aprime, evocab, wa, ba, h, vid, src, dst, win_start)
        return out, (aprime, evocab, wa, ba, h, vid, src, dst, win_start)

    def bwd(res, gout):
        aprime, evocab, wa, ba, h, vid, src, dst, win_start = res
        if bwd == "kernel":
            da, dev, dwa, dba, dh = bwd_fn(
                aprime, evocab, wa, ba, h, vid, src, dst, win_start, gout)
            return da, dev, dwa, dba, dh, None, None, None, None
        _, vjp = jax.vjp(
            lambda a, ev, w, b, hh: sddmm_att_reference(
                a, ev, w, b, hh, vid, src, dst),
            aprime, evocab, wa, ba, h)
        da, dev, dwa, dba, dh = vjp(gout)
        return da, dev, dwa, dba, dh, None, None, None, None

    op.defvjp(fwd, bwd)
    return op
