"""Pallas TPU kernel: fused edge-MLP (head → ×T weight-shared tail).

Why a kernel: the reference edge-MLP applies one weight-SHARED square layer
T=50 times (edge_network.py:20). Under XLA each application is a separate
(E, pf)@(pf, pf) matmul round-tripping HBM; this kernel keeps the activation
block and the shared weight resident in VMEM for the whole chain.

Measured on TPU v5e (E=8192, pf=64, T=50, f32): bit-exact vs XLA in both
directions (maxdiff 0.0); runtime ≈ parity with XLA (fwd 711µs vs 694µs) —
the chain is bound by the sequential matmul dependency at 64-wide shapes,
not HBM, so VMEM residency doesn't buy time on this config. Kept as an
optional op (`spmm`/`edge_mlp` hooks) and as the scaffold for wider fusions
(edge-MLP + per-edge contract + scatter) where residency does pay.

Forward: grid over edge blocks; per block:
    x = relu(x @ W_head_i + b_i)  (head layers)
    for t in range(T): x = relu(x @ W_shared)
Backward (custom VJP): recomputes the forward chain in-VMEM (compute is
cheap once memory-resident) storing the T+H intermediate activations in a
scratch buffer, then walks the chain in reverse, accumulating dW_shared
across both the T applications and all edge blocks (sequential TPU grid →
read-modify-write accumulation into the same output block is safe).

Numerics identical to ops/message._edge_mlp_penultimate (relu activations);
tests/test_kernels.py checks both directions against the XLA reference in
interpret mode (CPU) and compiled (TPU when available).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, *args, n_head: int, tail: int):
    # args: head_w..., head_b..., shared_w, out_ref
    head_ws = args[:n_head]
    head_bs = args[n_head:2 * n_head]
    shared_ref = args[2 * n_head]
    out_ref = args[2 * n_head + 1]
    x = x_ref[:]
    for w_ref, b_ref in zip(head_ws, head_bs):
        x = jax.nn.relu(
            jnp.dot(x, w_ref[:], preferred_element_type=x.dtype) + b_ref[:])
    if tail > 0:
        w = shared_ref[:]

        def body(_, x):
            return jax.nn.relu(jnp.dot(x, w, preferred_element_type=x.dtype))

        # Mosaic only supports full unroll or none; fully unroll the chain
        # (static T, small body) so the matmuls schedule back-to-back
        x = jax.lax.fori_loop(0, tail, body, x, unroll=tail)
    out_ref[:] = x


def edge_mlp_forward(e, head_ws: Sequence, head_bs: Sequence, shared_w,
                     *, tail: int, block: int = 512,
                     interpret: bool = False):
    """e: (E, ef) → pen (E, pf). Weights as plain arrays (w: (in, out))."""
    E = e.shape[0]
    pf = shared_w.shape[0]
    n_head = len(head_ws)
    Eb = _round_up(E, block) // block

    kernel = functools.partial(_fwd_kernel, n_head=n_head, tail=tail)
    in_specs = (
        [pl.BlockSpec((block, e.shape[1]), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for w in head_ws]
        + [pl.BlockSpec((1, b.shape[0]), lambda i: (0, 0),
                        memory_space=pltpu.VMEM) for b in head_bs]
        + [pl.BlockSpec(shared_w.shape, lambda i: (0, 0),
                        memory_space=pltpu.VMEM)]
    )
    out = pl.pallas_call(
        kernel,
        grid=(Eb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block, pf), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Eb * block, pf), e.dtype),
        interpret=interpret,
    )(_pad_rows(e, Eb * block),
      *head_ws, *[b.reshape(1, -1) for b in head_bs], shared_w)
    return out[:E]


def _pad_rows(x, rows: int):
    if x.shape[0] == rows:
        return x
    pad = rows - x.shape[0]
    return jnp.concatenate(
        [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_kernel(x_ref, g_ref, *args, n_head: int, tail: int,
                acts_shape):
    # args: head_w refs..., head_b refs..., shared_w,
    #       dx_ref, dhead_w refs..., dhead_b refs..., dshared_ref, acts
    head_ws = args[:n_head]
    head_bs = args[n_head:2 * n_head]
    shared_ref = args[2 * n_head]
    dx_ref = args[2 * n_head + 1]
    dhead_ws = args[2 * n_head + 2: 2 * n_head + 2 + n_head]
    dhead_bs = args[2 * n_head + 2 + n_head: 2 * n_head + 2 + 2 * n_head]
    dshared_ref = args[4 * n_head + 2]
    acts = args[4 * n_head + 3]          # VMEM scratch (n_acts, block, maxf)

    i = pl.program_id(0)

    # ---- recompute forward, stashing pre-relu linear outputs -------------
    x = x_ref[:]
    acts[0, :, :x.shape[1]] = x
    idx = 1
    for w_ref, b_ref in zip(head_ws, head_bs):
        z = jnp.dot(x, w_ref[:], preferred_element_type=x.dtype) + b_ref[:]
        x = jax.nn.relu(z)
        acts[idx, :, :x.shape[1]] = x
        idx += 1
    if tail > 0:
        w = shared_ref[:]
        pf = w.shape[0]

        def body(t, x):
            x = jax.nn.relu(jnp.dot(x, w, preferred_element_type=x.dtype))
            acts[idx + t, :, :pf] = x
            return x

        x = jax.lax.fori_loop(0, tail, body, x, unroll=False)

    # ---- backward through the tail ---------------------------------------
    g = g_ref[:]

    @pl.when(i == 0)
    def _():
        dshared_ref[:] = jnp.zeros_like(dshared_ref)
        for dw, db in zip(dhead_ws, dhead_bs):
            dw[:] = jnp.zeros_like(dw)
            db[:] = jnp.zeros_like(db)

    if tail > 0:
        w = shared_ref[:]
        pf = w.shape[0]

        def bwd_body(t_rev, carry):
            g, dW = carry
            t = tail - 1 - t_rev
            y = acts[idx + t, :, :pf]            # post-relu output of step t
            gz = jnp.where(y > 0, g, 0.0)        # relu grad
            # input to tail step t lives at acts[idx + t - 1] (== the last
            # head output when t == 0, since idx = n_head + 1)
            x_in = acts[idx + t - 1, :, :pf]
            dW = dW + jnp.dot(x_in.T, gz, preferred_element_type=g.dtype)
            g = jnp.dot(gz, w.T, preferred_element_type=g.dtype)
            return g, dW

        g, dW = jax.lax.fori_loop(
            0, tail, bwd_body,
            (g, jnp.zeros((pf, pf), g.dtype)))
        dshared_ref[:] += dW

    # ---- backward through the head ---------------------------------------
    for li in range(n_head - 1, -1, -1):
        y = acts[li + 1, :, :head_ws[li].shape[1]]
        gz = jnp.where(y > 0, g, 0.0)
        x_in = acts[li, :, :head_ws[li].shape[0]]
        dhead_ws[li][:] += jnp.dot(x_in.T, gz,
                                   preferred_element_type=g.dtype)
        dhead_bs[li][:] += jnp.sum(gz, axis=0, keepdims=True)
        g = jnp.dot(gz, head_ws[li][:].T, preferred_element_type=g.dtype)
    dx_ref[:] = g


def edge_mlp_backward(e, g_pen, head_ws, head_bs, shared_w, *, tail: int,
                      block: int = 256, interpret: bool = False):
    # smaller default block than forward: the bwd scratch holds
    # (1+H+T, block, maxf) activations and must fit scoped VMEM (~16MB)
    E, ef = e.shape
    pf = shared_w.shape[0]
    n_head = len(head_ws)
    Eb = _round_up(E, block) // block
    maxf = max([ef, pf] + [w.shape[1] for w in head_ws])
    n_acts = 1 + n_head + tail

    kernel = functools.partial(_bwd_kernel, n_head=n_head, tail=tail,
                               acts_shape=(n_acts, block, maxf))
    in_specs = (
        [pl.BlockSpec((block, ef), lambda i: (i, 0),
                      memory_space=pltpu.VMEM),
         pl.BlockSpec((block, pf), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for w in head_ws]
        + [pl.BlockSpec((1, b.shape[0]), lambda i: (0, 0),
                        memory_space=pltpu.VMEM) for b in head_bs]
        + [pl.BlockSpec(shared_w.shape, lambda i: (0, 0),
                        memory_space=pltpu.VMEM)]
    )
    out_specs = (
        [pl.BlockSpec((block, ef), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for w in head_ws]
        + [pl.BlockSpec((1, b.shape[0]), lambda i: (0, 0),
                        memory_space=pltpu.VMEM) for b in head_bs]
        + [pl.BlockSpec(shared_w.shape, lambda i: (0, 0),
                        memory_space=pltpu.VMEM)]
    )
    out_shape = (
        [jax.ShapeDtypeStruct((Eb * block, ef), e.dtype)]
        + [jax.ShapeDtypeStruct(w.shape, w.dtype) for w in head_ws]
        + [jax.ShapeDtypeStruct((1, b.shape[0]), b.dtype) for b in head_bs]
        + [jax.ShapeDtypeStruct(shared_w.shape, shared_w.dtype)]
    )
    outs = pl.pallas_call(
        kernel,
        grid=(Eb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((n_acts, block, maxf), e.dtype)],
        interpret=interpret,
    )(_pad_rows(e, Eb * block), _pad_rows(g_pen, Eb * block),
      *head_ws, *[b.reshape(1, -1) for b in head_bs], shared_w)
    dx = outs[0][:E]
    dws = list(outs[1:1 + n_head])
    dbs = [b[0] for b in outs[1 + n_head:1 + 2 * n_head]]
    dshared = outs[-1]
    return dx, dws, dbs, dshared


# ---------------------------------------------------------------------------
# custom-vjp public op
# ---------------------------------------------------------------------------

def make_edge_mlp_op(tail: int, block: int = 512, bwd_block: int = 256,
                     interpret: bool = False):
    """Returns fn(e, head_ws, head_bs, shared_w) → pen with a fused Pallas
    forward and backward. head_ws/head_bs as tuples (pytree-stable)."""

    @jax.custom_vjp
    def op(e, head_ws, head_bs, shared_w):
        return edge_mlp_forward(e, head_ws, head_bs, shared_w, tail=tail,
                                block=block, interpret=interpret)

    def fwd(e, head_ws, head_bs, shared_w):
        pen = edge_mlp_forward(e, head_ws, head_bs, shared_w, tail=tail,
                               block=block, interpret=interpret)
        return pen, (e, head_ws, head_bs, shared_w)

    def bwd(res, g):
        e, head_ws, head_bs, shared_w = res
        dx, dws, dbs, dshared = edge_mlp_backward(
            e, g, head_ws, head_bs, shared_w, tail=tail, block=bwd_block,
            interpret=interpret)
        return dx, tuple(dws), tuple(dbs), dshared

    op.defvjp(fwd, bwd)
    return op
