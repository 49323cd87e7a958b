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

Forward runs in Pallas; the backward of the public op replays the SAME
math as XLA gathers (jax.vjp of the reference formulation), so gradients
are exactly the sparse path's — the fused kernel accelerates the forward
(inference / the fwd half of training) without a hand-written 6-way VJP.

Parity: tests/test_kernels.py::TestSddmm (interpret mode) against
spmm_att_reference / models/sparse.py::sparse_att_edge_network semantics.
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
    src2 = _pad_edges(src, ep).reshape(nblk, block_edges)
    dst2 = _pad_edges(dst, ep).reshape(nblk, block_edges)
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
                  interpret: bool = False):
    """Returns op(aprime, evocab, wa, ba, h, vid, src, dst, win_start) with
    the fused Pallas forward; backward = VJP of the XLA reference (exact
    same math, so gradients equal the sparse path's)."""

    @jax.custom_vjp
    def op(aprime, evocab, wa, ba, h, vid, src, dst, win_start):
        return _sddmm_fwd(aprime, evocab, wa, ba, h, vid, src, dst,
                          win_start, block_edges=block_edges,
                          window=window, interpret=interpret)

    def fwd(aprime, evocab, wa, ba, h, vid, src, dst, win_start):
        out = _sddmm_fwd(aprime, evocab, wa, ba, h, vid, src, dst,
                         win_start, block_edges=block_edges,
                         window=window, interpret=interpret)
        return out, (aprime, evocab, wa, ba, h, vid, src, dst)

    def bwd(res, gout):
        aprime, evocab, wa, ba, h, vid, src, dst = res
        _, vjp = jax.vjp(
            lambda a, ev, w, b, hh: sddmm_att_reference(
                a, ev, w, b, hh, vid, src, dst),
            aprime, evocab, wa, ba, h)
        da, dev, dwa, dba, dh = vjp(gout)
        return da, dev, dwa, dba, dh, None, None, None, None

    op.defvjp(fwd, bwd)
    return op
