"""Edge-partitioned message passing (shard_map over the 'edge' mesh axis).

The graph-domain analog of sequence/context parallelism (SURVEY.md §2.6):
the batched graph's EDGE set is sharded across chips; node states are
replicated within the edge group; each chip computes the SpMM partial over
its local edges; one psum over ICI completes the aggregation. Because
segment-sum is linear, partial-sum + psum is EXACTLY the unsharded result.

Composition: this provides an `spmm_fn` for models/sparse.py's
sparse_edge_network_fused hook, so the whole sparse train step runs under an
outer jit with 'data' sharding while the inner SpMM is explicitly
edge-partitioned. jax.grad differentiates through shard_map (the psum
transposes correctly), so no custom VJP is needed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def make_edge_partitioned_spmm(mesh: Mesh, axis: str = "edge"):
    """Returns spmm_fn(ptilde, h, edge_src, edge_dst, wf) → (node_cap, mf).

    ptilde/edge_src/edge_dst are sharded over `axis` (edge dimension);
    h and wf are replicated along it. Inside each shard: gather → per-edge
    contract → local scatter-add; psum over `axis` completes the sum."""

    def spmm(ptilde, h, edge_src, edge_dst, wf):
        node_cap = h.shape[0]

        def local(pt, src, dst, h, wf):
            v = jnp.einsum("pmf,nf->npm", wf, h,
                           preferred_element_type=h.dtype)
            msg = jnp.einsum("ep,epm->em", pt, v[src],
                             preferred_element_type=h.dtype)
            agg = jax.ops.segment_sum(msg, dst, num_segments=node_cap)
            return jax.lax.psum(agg, axis)

        return shard_map(
            local, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(), P()),
            out_specs=P(),
        )(ptilde, edge_src, edge_dst, h, wf)

    return spmm


def make_edge_partitioned_spmm_kernel(mesh: Mesh, axis: str = "edge", *,
                                      block_edges: int = 512,
                                      window: int = 512,
                                      interpret: bool = False):
    """The Pallas windowed SpMM (kernels/spmm.py — the measured
    2-3× win over XLA) INSIDE the edge-partitioned shard_map: each chip
    runs the kernel over its local edge blocks, one psum completes the
    sum (round-2 VERDICT item 3 — without this, multi-chip EP forfeited
    the single-chip kernel win).

    Returns spmm_vocab_fn(a (K,mf,nf), h (N,nf), vid, src, dst,
    win_start) → (N, mf), a drop-in for models/sparse.py's A-form hook.
    vid/src/dst/win_start must be sharded cleanly over `axis`: pad the
    batch with shard_edges_for_spmm_kernel first (edge count a multiple
    of n_shards·block_edges so shard boundaries fall on whole blocks).
    jax.grad works: the kernel's custom VJP runs per shard and shard_map
    transposes the psum / replicated-input cotangents."""
    from mpnn_tpu.kernels.spmm import make_spmm_op
    op = make_spmm_op(block_edges=block_edges, window=window,
                      interpret=interpret)

    def spmm(a, h, vid, src, dst, win_start):
        def local(a, h, vid, src, dst, win):
            return jax.lax.psum(op(a, h, vid, src, dst, win), axis)

        # check_vma=False: pallas_call outputs don't declare their mesh
        # variance (same rule as kernels/ring_halo.py); the psum makes
        # the result replicated regardless
        return shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis)),
            out_specs=P(), check_vma=False,
        )(a, h, vid, src, dst, win_start)

    return spmm


def shard_edges_for_spmm_kernel(batch: dict, n_shards: int, *,
                                block_edges: int = 512,
                                window: int = 512,
                                align: int = 16):
    """Pad a packed batch's edge axis to a multiple of
    n_shards·block_edges and attach the kernel's window plan ('spmm_win')
    over the padded edges — shard boundaries then fall on whole edge
    blocks, so sharding win_start with P(axis) matches the edge shards
    exactly. Padded edges point at the dummy sink node with vid 0 (the
    zero matrix) — numerically null. Returns the new batch dict, or the
    original when the window plan declines (caller falls back)."""
    import numpy as np
    from mpnn_tpu.kernels.spmm import plan_edge_windows
    e = batch["edge_src"].shape[0]
    unit = n_shards * block_edges
    target = -(-e // unit) * unit
    out = dict(batch)
    node_cap = batch["node_feats"].shape[0]
    if target != e:
        pad = target - e
        out["edge_src"] = np.concatenate(
            [batch["edge_src"], np.full((pad,), node_cap - 1, np.int32)])
        out["edge_dst"] = np.concatenate(
            [batch["edge_dst"], np.full((pad,), node_cap - 1, np.int32)])
        out["edge_feats"] = np.concatenate(
            [batch["edge_feats"],
             np.zeros((pad, batch["edge_feats"].shape[-1]), np.float32)])
        out["edge_mask"] = np.concatenate(
            [batch["edge_mask"], np.zeros((pad,), np.float32)])
        if "edge_vid" in batch:
            out["edge_vid"] = np.concatenate(
                [batch["edge_vid"], np.zeros((pad,), np.int32)])
        if "edge_types" in batch:
            out["edge_types"] = np.concatenate(
                [batch["edge_types"], np.zeros((pad,), np.int32)])
    plan = plan_edge_windows(
        out["edge_src"], out["edge_dst"], out["edge_mask"], node_cap,
        block_edges, window=window, align=align)
    if plan is None:
        return batch
    out["spmm_win"] = plan.win_start
    return out


def shard_edges_for_mesh(batch: dict, n_shards: int) -> dict:
    """Pad the edge axis of a packed batch dict to a multiple of n_shards
    (keeps shard_map block shapes even). Padded edges use the existing
    dummy-sink convention and are numerically null."""
    e = batch["edge_src"].shape[0]
    target = -(-e // n_shards) * n_shards
    if target == e:
        return batch
    import numpy as np
    pad = target - e
    out = dict(batch)
    node_cap = batch["node_feats"].shape[0]
    out["edge_src"] = np.concatenate(
        [batch["edge_src"], np.full((pad,), node_cap - 1, np.int32)])
    out["edge_dst"] = np.concatenate(
        [batch["edge_dst"], np.full((pad,), node_cap - 1, np.int32)])
    out["edge_feats"] = np.concatenate(
        [batch["edge_feats"],
         np.zeros((pad, batch["edge_feats"].shape[-1]), np.float32)])
    out["edge_mask"] = np.concatenate(
        [batch["edge_mask"], np.zeros((pad,), np.float32)])
    return out
