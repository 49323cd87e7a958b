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
