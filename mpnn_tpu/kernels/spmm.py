"""Pallas TPU SpMM: the fused message+aggregate step of the sparse path.

Computes   out[d] = Σ_{e : dst_e = d}  A[vid_e] · h[src_e]        (N, mf)

which is the whole per-step message work of BOTH hot message families once
the edge vocabulary exists (graphs/batching.py::attach_edge_vocab):

  * EdgeNetwork (reference mpnn_functions/message/edge_network.py:42-51):
    A[k] = Σ_p (pen_k − pen_0)[p] · W̃[p]  — the A0-decomposed edge matrix
    per DISTINCT bond-feature row (models/sparse.py docstring);
  * GGNN (ggnn_msg_pass.py:20): A[k] = the per-edge-TYPE weight matrix,
    vid = bond types (A[0] = 0).

TPU-first design — no scatter/gather primitives anywhere:

  The packed batch stores each graph's nodes CONTIGUOUSLY, so any block of
  consecutive edges references a narrow node window. The host planner
  (plan_edge_windows) picks one window start per edge block; inside the
  kernel, gather and scatter become ONE-HOT MATMULS against that window:

      hs    = onehot(src−ws) @ h[ws:ws+W]          (BE,W)@(W,nf)   MXU
      bulk  = hs @ A2                              (BE,nf)@(nf,K·mf) MXU
      msgs  = Σ_k onehot_k(vid) ⊙ bulk[:,k,:]      VPU select
      out[ws:ws+W] += onehot(dst−ws)ᵀ @ msgs       (W,BE)@(BE,mf)  MXU

  Out-of-window indices match no one-hot row → contribute nothing, which is
  exactly right for padded edges (their A row is the zero matrix anyway).
  The TPU grid is sequential, so accumulating into the full-VMEM output
  across blocks is race-free.

Backward (custom VJP) reuses the same machinery:
      dh = spmm(Aᵀ, g, vid, dst, src)      (transpose = swap src/dst)
      dA[k] = Σ_e 1[vid_e=k] · g[dst_e] · h[src_e]ᵀ   (one-hot outer-product
               matmul per block, accumulated in VMEM)

Parity: tests/test_kernels.py (interpret mode on CPU, compiled on TPU)
against the XLA einsum+segment_sum reference.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


WINDOW_BUCKETS = (128, 256, 512, 1024, 2048)


class EdgeWindowPlan(NamedTuple):
    """Host-side plan: per-edge-block node-window starts (+ static sizes)."""
    win_start: np.ndarray       # (nblk,) int32, multiples of 8
    block_edges: int
    window: int
    n_blocks: int


def plan_edge_windows(src: np.ndarray, dst: np.ndarray,
                      edge_mask: np.ndarray, node_cap: int,
                      block_edges: int = 512,
                      window: Optional[int] = None,
                      align: int = 16
                      ) -> Optional[EdgeWindowPlan]:
    """Pick a window start per block of `block_edges` consecutive edges such
    that every REAL edge's src and dst fall inside [ws, ws+window). Returns
    None when no bucketed window fits (caller falls back to XLA). Purely
    host-side numpy — run once per batch at collation time.

    align: window-start/size alignment. 16 suits the row-layout kernels
    (node windows slice the SUBLANE axis); the transposed kernels slice
    the LANE axis and need align=128."""
    e = src.shape[0]
    nblk = _round_up(e, block_edges) // block_edges
    pad = nblk * block_edges - e
    real = edge_mask > 0
    idx = np.where(real, np.minimum(src, dst), np.iinfo(np.int32).max)
    hix = np.where(real, np.maximum(src, dst), -1)
    if pad:
        idx = np.concatenate([idx, np.full(pad, np.iinfo(np.int32).max)])
        hix = np.concatenate([hix, np.full(pad, -1)])
    lo = idx.reshape(nblk, block_edges).min(axis=1)
    hi = hix.reshape(nblk, block_edges).max(axis=1)
    empty = hi < 0
    lo = np.where(empty, 0, lo)
    hi = np.where(empty, 0, hi)
    ws = (lo // align) * align
    span = hi - ws + 1
    need = int(span.max()) if len(span) else 1
    gran = max(2 * align, 32)
    # the row-layout kernels index h arrays of EXACTLY node_cap rows, so
    # the window may not exceed it; the transposed kernels index
    # 128-lane-padded arrays, so the padded cap is the bound
    limit = _round_up(node_cap, align) if align >= 128 else node_cap
    if window is None:
        # exact fit rounded up (any multiple of `align` is legal; a coarse
        # bucket ladder wasted ~2x one-hot compute — BE=512 blocks of
        # molecular batches only span ~270 nodes). If a block needs more
        # than 4x the edge-block size, the locality premise failed (edges
        # not packed graph-contiguously) — decline and let XLA handle it.
        max_window = min(max(4 * block_edges, gran), limit)
        window = min(max(_round_up(need, gran), 2 * align), limit)
        if need > max_window:
            return None
    elif need > window or window > limit:
        return None
    # Clamp starts so every slice stays inside the arrays the kernels
    # index (limit rows/lanes) WITHOUT breaking the alignment promised
    # via pl.multiple_of — a misaligned start is a silent miscompile on
    # TPU. The clamp bound is floored to `align`; if that floor costs a
    # block its coverage (possible only when limit is not a multiple of
    # align, i.e. row layouts with odd node caps), decline and let the
    # caller fall back.
    bound = max(((limit - window) // align) * align, 0)
    ws = np.minimum(ws, bound).astype(np.int32)
    ws = np.maximum(ws, 0)
    if len(hi) and int((hi - ws).max()) >= window:
        return None
    return EdgeWindowPlan(ws, block_edges, window, nblk)


def attach_spmm_plan(batch: dict, block_edges: int = 512,
                     align: int = 16) -> dict:
    """Append 'spmm_win' (nblk,) to a packed batch (host-side). No-op when
    no window bucket fits (continuous fallback to the XLA path)."""
    plan = plan_edge_windows(np.asarray(batch["edge_src"]),
                             np.asarray(batch["edge_dst"]),
                             np.asarray(batch["edge_mask"]),
                             int(np.asarray(batch["node_feats"]).shape[0]),
                             block_edges, align=align)
    if plan is None:
        return batch
    out = dict(batch)
    out["spmm_win"] = plan.win_start
    out["spmm_block_edges"] = plan.block_edges
    out["spmm_window"] = plan.window
    return out


def _pad_edges(x, rows, fill=0):
    """Pad the edge array to `rows`. fill=0 is safe for the SpMM kernels
    (vocab row 0 / GGNN type 0 is the exact zero matrix, so a grid-pad
    edge aliasing node 0 contributes nothing); kernels whose vocab row 0
    is NONZERO (sddmm.py: A'_0 carries the final bias) must pad src/dst
    with -1 so pad edges fall outside every window's one-hot."""
    if x.shape[0] == rows:
        return x
    return jnp.concatenate(
        [x, jnp.full((rows - x.shape[0],) + x.shape[1:], fill, x.dtype)],
        axis=0)


# ---------------------------------------------------------------------------
# forward kernels — two layouts:
#   * 'vmem': h/out fully VMEM-resident (fastest; fits up to ~16k nodes —
#     the (N, nf) buffer pads nf to 128 lanes in VMEM)
#   * 'hbm' : h/out stay in HBM with the features padded to a 128-lane
#     panel; each block DMAs only its node WINDOW into VMEM (scales to any
#     node count; Mosaic requires 128-aligned DMA slice widths)
# ---------------------------------------------------------------------------

def _fwd_kernel_vmem(win_ref, src_ref, dst_ref, vid_ref, a2_ref, h_ref, out_ref,
                *, window: int, kmats: int, mf: int):
    # edge index arrays arrive as FULL (nblk, BE) VMEM buffers (a (1, BE)
    # block would violate the (8, 128) tile rule); row i is this block's
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ws = pl.multiple_of(win_ref[i], 16)
    be = src_ref.shape[1]
    kmf = kmats * mf
    dtype = h_ref.dtype
    hw = h_ref[pl.ds(ws, window), :]                       # (W, nf)
    src = src_ref[i, :] - ws
    dst = dst_ref[i, :] - ws
    vid = vid_ref[i, :]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (be, window), 1)
    oh_src = (iota_w == src[:, None]).astype(dtype)
    hs = jnp.dot(oh_src, hw, preferred_element_type=jnp.float32).astype(dtype)  # (BE, nf)
    bulk = jnp.dot(hs, a2_ref[:],
                   preferred_element_type=jnp.float32).astype(dtype)            # (BE, K·mf)
    # select vocab-id block per edge WITHOUT 3D reshapes (Mosaic-friendly):
    #   ohm[e, k·mf+m] = 1[vid_e = k];  msgs = (ohm ⊙ bulk) @ S,
    #   S[k·mf+m, m'] = 1[m = m']  (strided column-group reduction as MXU)
    lane = jax.lax.broadcasted_iota(jnp.int32, (be, kmf), 1)
    ohm = (lane // mf == vid[:, None]).astype(dtype)
    sel = (jax.lax.broadcasted_iota(jnp.int32, (kmf, mf), 0) % mf
           == jax.lax.broadcasted_iota(jnp.int32, (kmf, mf), 1)
           ).astype(dtype)
    msgs = jnp.dot(ohm * bulk, sel,
                   preferred_element_type=jnp.float32).astype(dtype)            # (BE, mf)
    oh_dst = (iota_w == dst[:, None]).astype(dtype)
    contrib = jnp.dot(oh_dst.T, msgs,
                      preferred_element_type=jnp.float32).astype(dtype)         # (W, mf)
    cur = out_ref[pl.ds(ws, window), :]
    out_ref[pl.ds(ws, window), :] = cur + contrib



def _spmm_fwd_vmem(a, h, vid, src, dst, win_start, *, block_edges: int,
              window: int, interpret: bool = False):
    """a: (K, mf, nf); h: (N, nf) → (N, mf)."""
    k, mf, nf = a.shape
    n = h.shape[0]
    e = src.shape[0]
    nblk = _round_up(e, block_edges) // block_edges
    ep = nblk * block_edges
    a2 = jnp.transpose(a, (2, 0, 1)).reshape(nf, k * mf)    # (nf, K·mf)
    src2 = _pad_edges(src, ep).reshape(nblk, block_edges)
    dst2 = _pad_edges(dst, ep).reshape(nblk, block_edges)
    vid2 = _pad_edges(vid, ep).reshape(nblk, block_edges)

    kernel = functools.partial(_fwd_kernel_vmem, window=window, kmats=k, mf=mf)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((nblk, block_edges), lambda i, w: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, block_edges), lambda i, w: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, block_edges), lambda i, w: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nf, k * mf), lambda i, w: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, nf), lambda i, w: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, mf), lambda i, w: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, mf), h.dtype),
        interpret=interpret,
    )(win_start, src2, dst2, vid2, a2, h)




def _fwd_kernel_hbm(win_ref, src_ref, dst_ref, vid_ref, a2_ref, h_hbm,
                    zero_ref, out_hbm, hw, ow, sems,
                    *, window: int, kmats: int, mf: int, mfp: int):
    # h and out live in HBM — VMEM holds only one node WINDOW at a time, so
    # the kernel scales to any node count (a full (N, nf) f32 buffer pads
    # nf to 128 lanes and blows the 16MB scoped-VMEM limit past ~30k nodes)
    i = pl.program_id(0)
    ws = pl.multiple_of(win_ref[i], 16)
    be = src_ref.shape[1]
    kmf = kmats * mf
    dtype = hw.dtype

    cp_h = pltpu.make_async_copy(h_hbm.at[pl.ds(ws, window), :], hw,
                                 sems.at[0])
    cp_o = pltpu.make_async_copy(out_hbm.at[pl.ds(ws, window), :], ow,
                                 sems.at[1])
    cp_h.start()
    cp_o.start()

    src = src_ref[i, :] - ws
    dst = dst_ref[i, :] - ws
    vid = vid_ref[i, :]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (be, window), 1)
    oh_src = (iota_w == src[:, None]).astype(dtype)
    # select vocab-id block per edge WITHOUT 3D reshapes (Mosaic-friendly):
    #   ohm[e, k·mf+m] = 1[vid_e = k];  msgs = (ohm ⊙ bulk) @ S,
    #   S[k·mf+m, m'] = 1[m = m']  (strided column-group reduction as MXU)
    lane = jax.lax.broadcasted_iota(jnp.int32, (be, kmf), 1)
    ohm = (lane // mf == vid[:, None]).astype(dtype)
    sel = (jax.lax.broadcasted_iota(jnp.int32, (kmf, mfp), 0) % mf
           == jax.lax.broadcasted_iota(jnp.int32, (kmf, mfp), 1)
           ).astype(dtype)
    oh_dst = (iota_w == dst[:, None]).astype(dtype)

    cp_h.wait()
    hs = jnp.dot(oh_src, hw[:], preferred_element_type=jnp.float32).astype(dtype)  # (BE, nf)
    bulk = jnp.dot(hs, a2_ref[:],
                   preferred_element_type=jnp.float32).astype(dtype)               # (BE, K·mf)
    msgs = jnp.dot(ohm * bulk, sel,
                   preferred_element_type=jnp.float32).astype(dtype)               # (BE, mf)
    contrib = jnp.dot(oh_dst.T, msgs,
                      preferred_element_type=jnp.float32).astype(dtype)            # (W, mf)
    cp_o.wait()
    ow[:] = ow[:] + contrib
    wb = pltpu.make_async_copy(ow, out_hbm.at[pl.ds(ws, window), :],
                               sems.at[1])
    wb.start()
    wb.wait()


def _spmm_fwd_hbm(a, h, vid, src, dst, win_start, *, block_edges: int,
                  window: int, interpret: bool = False, lanes: int = 128):
    """a: (K, mf, nf); h: (N, nf) → (N, mf). Feature dims are padded to a
    128-lane panel so the window DMAs satisfy Mosaic's alignment rule."""
    k, mf, nf = a.shape
    n = h.shape[0]
    e = src.shape[0]
    nblk = _round_up(e, block_edges) // block_edges
    ep = nblk * block_edges
    a2 = jnp.transpose(a, (2, 0, 1)).reshape(nf, k * mf)    # (nf, K·mf)
    a2 = jnp.pad(a2, ((0, lanes - nf), (0, 0)))             # (128, K·mf)
    hp = jnp.pad(h, ((0, 0), (0, lanes - nf)))              # (N, 128)
    src2 = _pad_edges(src, ep).reshape(nblk, block_edges)
    dst2 = _pad_edges(dst, ep).reshape(nblk, block_edges)
    vid2 = _pad_edges(vid, ep).reshape(nblk, block_edges)
    zeros = jnp.zeros((n, lanes), h.dtype)

    kernel = functools.partial(_fwd_kernel_hbm, window=window, kmats=k,
                               mf=mf, mfp=lanes)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((nblk, block_edges), lambda i, w: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, block_edges), lambda i, w: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, block_edges), lambda i, w: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lanes, k * mf), lambda i, w: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),       # h stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),       # zero-init of out
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((window, lanes), h.dtype),
            pltpu.VMEM((window, lanes), h.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, lanes), h.dtype),
        input_output_aliases={6: 0},     # pre-zeroed out accumulates in HBM
        interpret=interpret,
    )(win_start, src2, dst2, vid2, a2, hp, zeros)
    return out[:, :mf]


# ---------------------------------------------------------------------------
# backward kernels for dA
# ---------------------------------------------------------------------------

def _da_kernel_vmem(win_ref, src_ref, dst_ref, vid_ref, h_ref, g_ref, da_ref,
               *, window: int, kmats: int, mf: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        da_ref[:] = jnp.zeros_like(da_ref)

    ws = pl.multiple_of(win_ref[i], 16)
    be = src_ref.shape[1]
    dtype = h_ref.dtype
    hw = h_ref[pl.ds(ws, window), :]
    gw = g_ref[pl.ds(ws, window), :]
    src = src_ref[i, :] - ws
    dst = dst_ref[i, :] - ws
    vid = vid_ref[i, :]
    kmf = kmats * mf
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (be, window), 1)
    oh_src = (iota_w == src[:, None]).astype(dtype)
    oh_dst = (iota_w == dst[:, None]).astype(dtype)
    hs = jnp.dot(oh_src, hw, preferred_element_type=jnp.float32).astype(dtype)   # (BE, nf)
    gd = jnp.dot(oh_dst, gw, preferred_element_type=jnp.float32).astype(dtype)   # (BE, mf)
    # gk[e, k·mf+m] = 1[vid_e=k]·gd[e,m]  → dA2 += gkᵀ @ hs  (K·mf, nf)
    # 2D only (Mosaic): tile gd over k with the selection matrix Sᵀ, then
    # mask by the lane-expanded vocab one-hot
    lane = jax.lax.broadcasted_iota(jnp.int32, (be, kmf), 1)
    ohm = (lane // mf == vid[:, None]).astype(dtype)
    sel = (jax.lax.broadcasted_iota(jnp.int32, (kmf, mf), 0) % mf
           == jax.lax.broadcasted_iota(jnp.int32, (kmf, mf), 1)
           ).astype(dtype)
    gdr = jnp.dot(gd, sel.T, preferred_element_type=jnp.float32).astype(dtype)   # (BE, K·mf)
    gk = ohm * gdr
    da_ref[:] += jnp.dot(gk.T, hs, preferred_element_type=jnp.float32).astype(dtype)



def _spmm_da_vmem(a_shape, h, g, vid, src, dst, win_start, *, block_edges: int,
             window: int, interpret: bool = False):
    k, mf, nf = a_shape
    n = h.shape[0]
    e = src.shape[0]
    nblk = _round_up(e, block_edges) // block_edges
    ep = nblk * block_edges
    src2 = _pad_edges(src, ep).reshape(nblk, block_edges)
    dst2 = _pad_edges(dst, ep).reshape(nblk, block_edges)
    vid2 = _pad_edges(vid, ep).reshape(nblk, block_edges)

    kernel = functools.partial(_da_kernel_vmem, window=window, kmats=k, mf=mf)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((nblk, block_edges), lambda i, w: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, block_edges), lambda i, w: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, block_edges), lambda i, w: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, h.shape[1]), lambda i, w: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, mf), lambda i, w: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k * mf, nf), lambda i, w: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    da2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k * mf, nf), h.dtype),
        interpret=interpret,
    )(win_start, src2, dst2, vid2, h, g)
    return da2.reshape(k, mf, nf)




def _da_kernel_hbm(win_ref, src_ref, dst_ref, vid_ref, h_hbm, g_hbm,
                   da_ref, hw, gw, sems,
                   *, window: int, kmats: int, mf: int, mfp: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        da_ref[:] = jnp.zeros_like(da_ref)

    ws = pl.multiple_of(win_ref[i], 16)
    be = src_ref.shape[1]
    dtype = hw.dtype
    cp_h = pltpu.make_async_copy(h_hbm.at[pl.ds(ws, window), :], hw,
                                 sems.at[0])
    cp_g = pltpu.make_async_copy(g_hbm.at[pl.ds(ws, window), :], gw,
                                 sems.at[1])
    cp_h.start()
    cp_g.start()
    src = src_ref[i, :] - ws
    dst = dst_ref[i, :] - ws
    vid = vid_ref[i, :]
    kmf = kmats * mf
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (be, window), 1)
    oh_src = (iota_w == src[:, None]).astype(dtype)
    oh_dst = (iota_w == dst[:, None]).astype(dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (be, kmf), 1)
    ohm = (lane // mf == vid[:, None]).astype(dtype)
    sel = (jax.lax.broadcasted_iota(jnp.int32, (kmf, mfp), 0) % mf
           == jax.lax.broadcasted_iota(jnp.int32, (kmf, mfp), 1)
           ).astype(dtype)
    cp_h.wait()
    cp_g.wait()
    hs = jnp.dot(oh_src, hw[:], preferred_element_type=jnp.float32).astype(dtype)  # (BE, 128)
    gd = jnp.dot(oh_dst, gw[:], preferred_element_type=jnp.float32).astype(dtype)  # (BE, 128)
    # gk[e, k·mf+m] = 1[vid_e=k]·gd[e,m]  → dA2 += gkᵀ @ hs  (K·mf, 128)
    # 2D only (Mosaic): tile gd over k with the selection matrix Sᵀ, then
    # mask by the lane-expanded vocab one-hot
    gdr = jnp.dot(gd, sel.T, preferred_element_type=jnp.float32).astype(dtype)   # (BE, K·mf)
    gk = ohm * gdr
    da_ref[:] += jnp.dot(gk.T, hs, preferred_element_type=jnp.float32).astype(dtype)


def _spmm_da_hbm(a_shape, h, g, vid, src, dst, win_start, *,
                 block_edges: int, window: int, interpret: bool = False,
                 lanes: int = 128):
    k, mf, nf = a_shape
    n = h.shape[0]
    e = src.shape[0]
    nblk = _round_up(e, block_edges) // block_edges
    ep = nblk * block_edges
    hp = jnp.pad(h, ((0, 0), (0, lanes - h.shape[1])))
    gp = jnp.pad(g, ((0, 0), (0, lanes - g.shape[1])))
    src2 = _pad_edges(src, ep).reshape(nblk, block_edges)
    dst2 = _pad_edges(dst, ep).reshape(nblk, block_edges)
    vid2 = _pad_edges(vid, ep).reshape(nblk, block_edges)

    kernel = functools.partial(_da_kernel_hbm, window=window, kmats=k,
                               mf=mf, mfp=lanes)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((nblk, block_edges), lambda i, w: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, block_edges), lambda i, w: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, block_edges), lambda i, w: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),       # h in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),       # g in HBM
        ],
        out_specs=pl.BlockSpec((k * mf, lanes), lambda i, w: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((window, lanes), h.dtype),
            pltpu.VMEM((window, lanes), h.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    da2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k * mf, lanes), h.dtype),
        interpret=interpret,
    )(win_start, src2, dst2, vid2, hp, gp)
    return da2[:, :nf].reshape(k, mf, nf)


# ---------------------------------------------------------------------------
# public custom-VJP op
# ---------------------------------------------------------------------------

# up to this node count the fully-VMEM layout fits the 16MB scoped budget
# (the (N, nf) buffer pads nf to 128 lanes: N·128·4B ≈ 8MB at 16k nodes)
VMEM_LAYOUT_MAX_NODES = 16384


def make_spmm_op(block_edges: int = 512, window: int = 512,
                 interpret: bool = False, layout: str = "auto"):
    """Returns spmm(a, h, vid, src, dst, win_start) → (N, mf) with the
    Pallas forward and a fused Pallas backward. Static shapes:
    a (K, mf, nf), h (N, nf), vid/src/dst (E,) int32,
    win_start (ceil(E/block_edges),) int32 from plan_edge_windows.

    layout: 'vmem' (h/out resident, fastest, ≤ ~16k nodes), 'hbm'
    (window DMAs, any size), or 'auto' (pick by node count)."""

    def pick(n):
        if layout != "auto":
            return layout
        return "vmem" if n <= VMEM_LAYOUT_MAX_NODES else "hbm"

    def run_fwd(a, h, vid, src, dst, win_start):
        fn = _spmm_fwd_vmem if pick(h.shape[0]) == "vmem" else _spmm_fwd_hbm
        return fn(a, h, vid, src, dst, win_start, block_edges=block_edges,
                  window=window, interpret=interpret)

    def run_da(a_shape, h, g, vid, src, dst, win_start):
        fn = _spmm_da_vmem if pick(h.shape[0]) == "vmem" else _spmm_da_hbm
        return fn(a_shape, h, g, vid, src, dst, win_start,
                  block_edges=block_edges, window=window,
                  interpret=interpret)

    @jax.custom_vjp
    def op(a, h, vid, src, dst, win_start):
        return run_fwd(a, h, vid, src, dst, win_start)

    def fwd(a, h, vid, src, dst, win_start):
        return (run_fwd(a, h, vid, src, dst, win_start),
                (a, h, vid, src, dst, win_start))

    def bwd(res, g):
        a, h, vid, src, dst, win_start = res
        at = jnp.transpose(a, (0, 2, 1))          # (K, nf, mf)
        # transpose graph: out[s] += Aᵀ[vid] g[dst]  → swap src/dst
        dh = run_fwd(at, g, vid, dst, src, win_start)
        da = run_da(a.shape, h, g, vid, src, dst, win_start)
        return da, dh, None, None, None, None

    op.defvjp(fwd, bwd)
    return op


def spmm_reference(a, h, vid, src, dst):
    """XLA reference: einsum + gather + segment_sum (what the kernel must
    reproduce; also the fallback path in models/sparse.py)."""
    msgs = jnp.einsum("emn,en->em", a[vid], h[src],
                      preferred_element_type=h.dtype)
    return jax.ops.segment_sum(msgs, dst, num_segments=h.shape[0])
