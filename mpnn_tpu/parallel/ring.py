"""Ring-partitioned SpMM: fully-sharded message passing.

The edge_partition.py scheme replicates node states within the edge group —
fine when a batch's node states fit one chip. This module removes that
limit: BOTH nodes and edges are sharded, and node shards ride the ring
(lax.ppermute over ICI) while each device accumulates partial aggregations
for its local edges — the graph-domain analog of ring attention / context
parallelism (SURVEY.md §2.6, §5 long-context analog).

Layout (built host-side by partition_edges_ring):
  - the flat node axis splits into D contiguous shards of size S;
  - edges are bucketed by (dst_shard, src_shard): device p owns all edges
    whose DESTINATION lies in shard p, grouped into D buckets by source
    shard, each padded to a common capacity;
  - padded edges carry zero `ptilde` rows, so they contribute exactly
    nothing (the A0 trick from models/sparse.py — no masking needed).

Execution (shard_map over the 'ring' axis, D rounds):
  round r: device p holds node shard q = (p − r) mod D, contracts its
  bucket[q] edges against it, scatter-adds into its local output shard,
  then ppermutes the shard to its neighbor. XLA schedules the permute
  asynchronously, overlapping communication with the local contraction.

The per-graph A0 correction (bias leakage) and node-level ops stay outside:
this kernel computes exactly  Σ_{edges} W̃(p_e − p_0) h_src  per destination
shard, summing to the unsharded sparse_edge_network_fused edge term.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def partition_edges_ring(batch: Dict[str, np.ndarray], d: int
                         ) -> Dict[str, np.ndarray]:
    """Reshape a packed batch for the ring layout.

    Returns a dict with:
      node_feats_sh (D, S, f), node_mask_sh (D, S, 1), node_graph_sh (D, S),
      ring_src (D, D, Eb) LOCAL source index within the source shard,
      ring_dst (D, D, Eb) LOCAL dest index within the dest shard,
      ring_efeats (D, D, Eb, e) raw edge features (zero rows at padding),
      plus S, d and pass-through labels/graph_mask."""
    node_feats = batch["node_feats"]
    n = node_feats.shape[0]
    s = -(-n // d)
    pad_n = s * d - n
    nf = np.pad(node_feats, ((0, pad_n), (0, 0)))
    nm = np.pad(batch["node_mask"], ((0, pad_n), (0, 0)))
    ng = np.pad(batch["node_graph"], (0, pad_n),
                constant_values=batch["graph_mask"].shape[0])

    src = batch["edge_src"]
    dst = batch["edge_dst"]
    efeats = batch["edge_feats"]
    emask = batch["edge_mask"]
    real = emask > 0

    buckets: Dict[Tuple[int, int], list] = {}
    for e in np.nonzero(real)[0]:
        key = (int(dst[e]) // s, int(src[e]) // s)
        buckets.setdefault(key, []).append(e)
    eb = max((len(v) for v in buckets.values()), default=1)

    # padded bucket slots point OUT OF RANGE (local index s): every
    # consumer drops them structurally — the halo kernel's one-hots
    # (iota < s) produce zero rows, segment_sum(num_segments=s) discards
    # id s, and clamped gathers feed rows whose cotangent is zero. Padding
    # to 0 would be correct only when slot 0's payload is zero (ptilde row
    # 0 / vocab id 0); collate_packed permits a batch with NO padded edges,
    # where vocab row 0 is a real bond and vid-0 pad slots would silently
    # scatter real messages into local node 0 (halo path).
    ring_src = np.full((d, d, eb), s, np.int32)
    ring_dst = np.full((d, d, eb), s, np.int32)
    ring_efeats = np.zeros((d, d, eb, efeats.shape[-1]), np.float32)
    etypes = batch.get("edge_types")
    ring_etypes = (np.zeros((d, d, eb), np.int32)
                   if etypes is not None else None)
    evids = batch.get("edge_vid")
    ring_vids = (np.zeros((d, d, eb), np.int32)
                 if evids is not None else None)
    for (pd_, ps_), idxs in buckets.items():
        k = len(idxs)
        ring_src[pd_, ps_, :k] = src[idxs] % s
        ring_dst[pd_, ps_, :k] = dst[idxs] % s
        ring_efeats[pd_, ps_, :k] = efeats[idxs]
        if ring_etypes is not None:
            ring_etypes[pd_, ps_, :k] = etypes[idxs]   # pad type 0 = no bond
        if ring_vids is not None:
            ring_vids[pd_, ps_, :k] = evids[idxs]      # pad vid 0 = zero A

    out = {
        "node_feats_sh": nf.reshape(d, s, -1),
        "node_mask_sh": nm.reshape(d, s, 1),
        "node_graph_sh": ng.reshape(d, s),
        "ring_src": ring_src,
        "ring_dst": ring_dst,
        "ring_efeats": ring_efeats,
        "shard_size": s,
    }
    if ring_etypes is not None:
        out["ring_etypes"] = ring_etypes
    if ring_vids is not None:
        # edge-VOCAB ids bucketed like src/dst (for the A-form halo-kernel
        # edge term, kernels/ring_halo.py) + the vocab's distinct feature
        # rows so the device can fold the tiny A-matrix table itself
        out["ring_vids"] = ring_vids
        out["ring_vrows"] = batch["edge_feats"][batch["edge_vfirst"]]
    return out


def make_ring_spmm(mesh: Mesh, axis: str = "edge"):
    """Returns ring_fn(node_shards, ring_src, ring_dst, ring_ptilde, wf)
    → per-shard aggregated messages (D, S, mf), everything sharded over
    `axis`. ring_ptilde: (D, D, Eb, pf) = pen − pen0 per bucket (computed by
    the caller from ring_efeats so the edge-MLP runs sharded too)."""
    d = mesh.shape[axis]

    def local(node_shard, src_b, dst_b, pt_b, wf):
        # local shapes: (1, S, nf), (1, D, Eb), (1, D, Eb), (1, D, Eb, pf)
        h = node_shard[0]
        s = h.shape[0]
        pf, mf, nfeat = wf.shape
        my = jax.lax.axis_index(axis)

        def round_body(r, carry):
            h_rot, acc = carry
            q = (my - r) % d                       # shard id of h_rot
            pt = jnp.take(pt_b[0], q, axis=0)      # (Eb, pf)
            src = jnp.take(src_b[0], q, axis=0)
            dst = jnp.take(dst_b[0], q, axis=0)
            v = jnp.einsum("pmf,nf->npm", wf, h_rot,
                           preferred_element_type=h.dtype)
            msg = jnp.einsum("ep,epm->em", pt, v[src],
                             preferred_element_type=h.dtype)
            acc = acc + jax.ops.segment_sum(msg, dst, num_segments=s)
            h_next = jax.lax.ppermute(
                h_rot, axis, perm=[(i, (i + 1) % d) for i in range(d)])
            return h_next, acc

        # the accumulator must be marked device-varying over the ring axis
        # up front — the loop body produces varying values (shard_map vma
        # typing), and scan carries must have stable types
        acc0 = jax.lax.pcast(jnp.zeros((s, mf), h.dtype), (axis,),
                             to="varying")
        h_fin, acc = jax.lax.fori_loop(0, d, round_body, (h, acc0))
        return acc[None]

    def ring_fn(node_shards, ring_src, ring_dst, ring_ptilde, wf):
        return shard_map(
            local, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis), P()),
            out_specs=P(axis),
        )(node_shards, ring_src, ring_dst, ring_ptilde, wf)

    return ring_fn


def ring_edge_network_term(mesh: Mesh, mparams, ring_batch, cfg,
                           node_shards=None, axis: str = "edge"):
    """Convenience: full sharded edge term for the EdgeNetwork family —
    sharded edge-MLP penultimates (pen − pen0 per bucket) + ring SpMM.
    Returns (D, S, mf) sharded aggregation (edge term only; add the A0
    graph correction + message bias at the node level)."""
    from mpnn_tpu.models.sparse import _edge_penultimates

    efeats = ring_batch["ring_efeats"]
    d, _, eb, fe = efeats.shape
    pen, pen0, _ = _edge_penultimates(mparams, efeats.reshape(-1, fe), cfg)
    ptilde = (pen - pen0).reshape(d, d, eb, -1)
    pf = ptilde.shape[-1]
    wf = mparams["final"]["w"].reshape(pf, cfg.message_features,
                                       cfg.node_features)
    ring = make_ring_spmm(mesh, axis)
    h = ring_batch["node_feats_sh"] if node_shards is None else node_shards
    return ring(h, ring_batch["ring_src"], ring_batch["ring_dst"],
                ptilde, wf)
