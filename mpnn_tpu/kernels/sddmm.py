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
                  interpret: bool = False, bwd: str = "kernel"):
    """Returns op(aprime, evocab, wa, ba, h, vid, src, dst, win_start) with
    the fused Pallas forward. bwd='kernel' (default): the fused one-pass
    Pallas backward (_sddmm_bwd). bwd='xla': VJP of the XLA reference
    (exact same math, gather-heavy)."""

    @jax.custom_vjp
    def op(aprime, evocab, wa, ba, h, vid, src, dst, win_start):
        return _sddmm_fwd(aprime, evocab, wa, ba, h, vid, src, dst,
                          win_start, block_edges=block_edges,
                          window=window, interpret=interpret)

    def fwd(aprime, evocab, wa, ba, h, vid, src, dst, win_start):
        out = _sddmm_fwd(aprime, evocab, wa, ba, h, vid, src, dst,
                         win_start, block_edges=block_edges,
                         window=window, interpret=interpret)
        return out, (aprime, evocab, wa, ba, h, vid, src, dst, win_start)

    def bwd(res, gout):
        aprime, evocab, wa, ba, h, vid, src, dst, win_start = res
        if bwd == "kernel":
            da, dev, dwa, dba, dh = _sddmm_bwd(
                aprime, evocab, wa, ba, h, vid, src, dst, win_start, gout,
                block_edges=block_edges, window=window, interpret=interpret)
            return da, dev, dwa, dba, dh, None, None, None, None
        _, vjp = jax.vjp(
            lambda a, ev, w, b, hh: sddmm_att_reference(
                a, ev, w, b, hh, vid, src, dst),
            aprime, evocab, wa, ba, h)
        da, dev, dwa, dba, dh = vjp(gout)
        return da, dev, dwa, dba, dh, None, None, None, None

    op.defvjp(fwd, bwd)
    return op
