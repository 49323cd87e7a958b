"""Batch compilation: variable-size graphs → static-shape device batches.

The reference pads every batch to its own max atom count
(pre_process/data_loader.py:50-70) — under jit that is a recompile per batch
shape. The TPU-native replacement (SURVEY.md §7 "hard parts"):

  * size BUCKETING — node counts round up to a small set of bucket sizes, so
    the whole run compiles a handful of programs;
  * dense padded batches (B, Nb, …) for the dense message path;
  * packed COO batches for the sparse path: all graphs' nodes concatenated
    into one (total_nodes,) axis with per-node graph ids, edges as
    (src, dst) into that axis, padded to bucketed edge capacity. Padded
    edges point at a dedicated dummy node slot with zero features so
    segment-sum aggregation ignores them.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import numpy as np

from mpnn_tpu.graphs.graph import MolGraph


DEFAULT_NODE_BUCKETS = (8, 16, 24, 32, 48, 64, 96, 128)


def bucket_for(n: int, buckets: Sequence[int] = DEFAULT_NODE_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return int(np.ceil(n / 128.0)) * 128


# ---------------------------------------------------------------------------
# dense padded batches (reference-compatible layout)
# ---------------------------------------------------------------------------

def collate_dense(graphs: List[MolGraph],
                  num_nodes: Optional[int] = None,
                  buckets: Sequence[int] = DEFAULT_NODE_BUCKETS,
                  with_nafm: bool = True) -> Dict[str, np.ndarray]:
    """→ dict(afm (B,N,f), nafm, bfm (B,N,N,e), adj, mask (B,N,1), labels).
    N is the bucket of the batch max (static across same-bucket batches)."""
    batch_max = max(g.num_atoms for g in graphs)
    n = num_nodes if num_nodes is not None else bucket_for(batch_max, buckets)
    if batch_max > n:
        raise ValueError(f"graph with {batch_max} atoms exceeds capacity {n}")
    b = len(graphs)
    fa = graphs[0].afm.shape[-1]
    fe = graphs[0].bfm.shape[-1]
    afm = np.zeros((b, n, fa), np.float32)
    bfm = np.zeros((b, n, n, fe), np.float32)
    adj = np.zeros((b, n, n), np.float32)
    mask = np.zeros((b, n, 1), np.float32)
    out = {"afm": afm, "bfm": bfm, "adj": adj, "mask": mask}
    if with_nafm:
        fn = graphs[0].nafm.shape[-1]
        nafm = np.zeros((b, n, fn), np.float32)
        out["nafm"] = nafm
    for i, g in enumerate(graphs):
        a = g.num_atoms
        afm[i, :a] = g.afm
        bfm[i, :a, :a] = g.bfm
        adj[i, :a, :a] = g.adj
        mask[i, :a] = 1.0
        if with_nafm:
            nafm[i, :a] = g.nafm
    first = np.asarray(graphs[0].label) if graphs[0].label is not None \
        else np.zeros(())
    if first.ndim == 2:
        # per-atom matrix labels (ECFP): pad along the atom axis
        nbits = first.shape[-1]
        labels = np.zeros((b, n, nbits), np.float32)
        for i, g in enumerate(graphs):
            labels[i, :g.num_atoms] = g.label
    else:
        labels = np.asarray([g.label for g in graphs])
        if labels.dtype == object:
            labels = np.stack([np.asarray(g.label) for g in graphs])
    out["labels"] = labels
    return out


def collate_dense_ecfp(graphs: List[MolGraph],
                       num_nodes: Optional[int] = None,
                       buckets: Sequence[int] = DEFAULT_NODE_BUCKETS
                       ) -> Dict[str, np.ndarray]:
    """ECFP variant: labels are per-atom bit matrices, padded along atoms
    (data_loader.py:72-88)."""
    out = collate_dense(graphs, num_nodes, buckets, with_nafm=False)
    n = out["afm"].shape[1]
    nbits = graphs[0].label.shape[-1]
    labels = np.zeros((len(graphs), n, nbits), np.float32)
    for i, g in enumerate(graphs):
        labels[i, :g.num_atoms] = g.label
    out["labels"] = labels
    return out


# ---------------------------------------------------------------------------
# packed COO batches (sparse TPU-native layout)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class PackedBatch:
    """Flat node axis of capacity `node_cap` (last slot = dummy sink for
    padded edges), edge axis of capacity `edge_cap`.

    node_feats : (node_cap, f)    zero rows at padding + dummy
    node_nafm  : (node_cap, fn)
    node_mask  : (node_cap, 1)    1 = real node
    node_graph : (node_cap,)      graph id per node (dummy/pad → num_graphs)
    edge_src   : (edge_cap,)      into the node axis (pad → node_cap-1)
    edge_dst   : (edge_cap,)
    edge_feats : (edge_cap, e)    zero rows at padding
    edge_mask  : (edge_cap,)      1 = real edge
    num_graphs : int
    labels     : (num_graphs, …)
    graph_mask : (num_graphs,)    1 = real graph (for padded graph slots)
    """
    node_feats: np.ndarray
    node_nafm: np.ndarray
    node_mask: np.ndarray
    node_graph: np.ndarray
    edge_src: np.ndarray
    edge_dst: np.ndarray
    edge_feats: np.ndarray
    edge_mask: np.ndarray
    labels: np.ndarray
    graph_mask: np.ndarray
    num_graphs: int
    # per-ATOM labels packed on the flat node axis (node_cap, nbits) —
    # the ECFP task's per-atom bit matrices (reference
    # collate_2d_ecfp_graphs pads them dense (B, N, nbits); packed they
    # are node-space like node_feats). None for per-graph-label tasks.
    node_labels: Optional[np.ndarray] = None

    def as_dict(self) -> Dict[str, np.ndarray]:
        d = dataclasses.asdict(self)
        if d.get("node_labels") is None:
            d.pop("node_labels", None)
        return d


def collate_packed(graphs: List[MolGraph],
                   node_cap: Optional[int] = None,
                   edge_cap: Optional[int] = None,
                   num_graphs: Optional[int] = None) -> PackedBatch:
    total_nodes = sum(g.num_atoms for g in graphs)
    total_edges = sum(g.num_edges for g in graphs)
    node_cap = node_cap or bucket_for(total_nodes + 1)
    edge_cap = edge_cap or bucket_for(total_edges)
    ng = num_graphs or len(graphs)
    if total_nodes + 1 > node_cap or total_edges > edge_cap:
        raise ValueError("batch exceeds packed capacity")

    fa = graphs[0].afm.shape[-1]
    fn = graphs[0].nafm.shape[-1]
    fe = graphs[0].edge_feats.shape[-1]
    node_feats = np.zeros((node_cap, fa), np.float32)
    node_nafm = np.zeros((node_cap, fn), np.float32)
    node_mask = np.zeros((node_cap, 1), np.float32)
    node_graph = np.full((node_cap,), ng, np.int32)
    edge_src = np.full((edge_cap,), node_cap - 1, np.int32)
    edge_dst = np.full((edge_cap,), node_cap - 1, np.int32)
    edge_feats = np.zeros((edge_cap, fe), np.float32)
    edge_mask = np.zeros((edge_cap,), np.float32)
    graph_mask = np.zeros((ng,), np.float32)

    n_off = e_off = 0
    for gi, g in enumerate(graphs):
        a, e = g.num_atoms, g.num_edges
        node_feats[n_off:n_off + a] = g.afm
        node_nafm[n_off:n_off + a] = g.nafm
        node_mask[n_off:n_off + a] = 1.0
        node_graph[n_off:n_off + a] = gi
        edge_src[e_off:e_off + e] = g.edge_src + n_off
        edge_dst[e_off:e_off + e] = g.edge_dst + n_off
        edge_feats[e_off:e_off + e] = g.edge_feats
        edge_mask[e_off:e_off + e] = 1.0
        graph_mask[gi] = 1.0
        n_off += a
        e_off += e

    node_labels = None
    first_label = graphs[0].label
    if first_label is not None and np.asarray(first_label).ndim == 2 \
            and np.asarray(first_label).shape[0] == graphs[0].num_atoms:
        # per-ATOM matrix labels (the ECFP task): pack node-space
        nbits = np.asarray(first_label).shape[-1]
        node_labels = np.zeros((node_cap, nbits),
                               np.asarray(first_label).dtype)
        n_off = 0
        for g in graphs:
            node_labels[n_off:n_off + g.num_atoms] = g.label
            n_off += g.num_atoms
        labels = np.zeros((ng,), np.float32)
    else:
        labels = np.stack([np.asarray(g.label) for g in graphs]) \
            if first_label is not None else np.zeros((len(graphs),))
        if labels.shape[0] < ng:
            pad = np.zeros((ng - labels.shape[0],) + labels.shape[1:],
                           labels.dtype)
            labels = np.concatenate([labels, pad])
    return PackedBatch(node_feats, node_nafm, node_mask, node_graph,
                       edge_src, edge_dst, edge_feats, edge_mask,
                       labels, graph_mask, ng, node_labels)


def build_edge_vocab(graphs, vocab_cap: int = 32):
    """Dataset-wide edge vocabulary, computed ONCE per run: the distinct
    encoded bond-feature rows with the all-zero (padding) row pinned at
    id 0, plus a cached per-graph vid array. Replaces the per-batch
    np.unique of attach_edge_vocab (its argsort over every batch's edge
    rows was ~29 ms/batch — the dominant host collation cost).

    Returns (rows (vocab_cap, ef) float32, vids: list aligned with
    `graphs`) or (None, None) when the dataset has more than vocab_cap
    distinct rows. Exact: identical rows map to identical penultimates;
    id 0 = the zero row makes A_0 the exact zero matrix (the convention
    the Pallas kernels' grid padding already relies on)."""
    efs = [g.edge_feats for g in graphs if g.num_edges]
    if efs:
        uniq = np.unique(np.concatenate(efs, axis=0), axis=0)
    else:
        uniq = np.zeros((0, graphs[0].edge_feats.shape[-1]
                         if graphs else 0), np.float32)
    fe = uniq.shape[1]
    zero = np.zeros((1, fe), uniq.dtype)
    nonzero = uniq[np.any(uniq != 0, axis=1)]
    rows = np.concatenate([zero, nonzero], axis=0)
    if rows.shape[0] > vocab_cap:
        return None, None
    lookup = {r.tobytes(): i for i, r in enumerate(rows)}
    vids = []
    for g in graphs:
        vids.append(np.asarray(
            [lookup[r.tobytes()] for r in np.asarray(g.edge_feats)],
            np.int32))
    rows = np.concatenate(
        [rows, np.zeros((vocab_cap - rows.shape[0], fe), rows.dtype)])
    return rows.astype(np.float32), vids


def attach_edge_vocab(batch: Dict[str, np.ndarray],
                      vocab_cap: int = 32) -> Dict[str, np.ndarray]:
    """Append the edge-feature VOCABULARY to a packed batch:

      edge_vid    (edge_cap,)   int32 — distinct-row id per edge
      edge_vfirst (vocab_cap,)  int32 — first edge index carrying each id

    Encoded bond features live in a tiny discrete set (one-hot bond type +
    binary flags — typically ≤ 16 distinct rows in a whole dataset), so the
    ×50 weight-shared edge-MLP (edge_network.py:20 semantics) only needs to
    run once per DISTINCT feature row, not once per edge: the sparse path
    (models/sparse.py) computes penultimates on the vocab and gathers. This
    is exact — identical input rows produce identical outputs through any
    row-wise transform (encoders / masked BN included).

    If the batch has more than vocab_cap distinct rows (e.g. continuous
    edge features), the keys are NOT added and the per-edge path is used.
    """
    ef = np.asarray(batch["edge_feats"])
    uniq, first_idx, inv = np.unique(ef, axis=0, return_index=True,
                                     return_inverse=True)
    if uniq.shape[0] > vocab_cap:
        return batch
    out = dict(batch)
    out["edge_vid"] = inv.reshape(-1).astype(np.int32)
    vfirst = np.zeros((vocab_cap,), np.int32)
    vfirst[:first_idx.shape[0]] = first_idx
    out["edge_vfirst"] = vfirst
    return out


def with_edge_types(batch: dict, graphs, node_cap: int = None) -> dict:
    """Append GGNN inputs to a collated batch: packed batches get
    'edge_types' (edge_cap,) aligned with edge_src/dst; dense batches get
    an integer 'bfm' (B, N, N). Graphs need attach_edge_types() first."""
    out = dict(batch)
    if "edge_src" in batch:            # packed
        edge_cap = batch["edge_src"].shape[0]
        types = np.zeros((edge_cap,), np.int32)
        off = 0
        for g in graphs:
            e = g.num_edges
            types[off:off + e] = g.edge_types
            off += e
        out["edge_types"] = types
    else:                              # dense
        b, n = batch["adj"].shape[:2]
        mat = np.zeros((b, n, n), np.int32)
        for i, g in enumerate(graphs):
            a = g.num_atoms
            mat[i, :a, :a] = g.bond_type_matrix
        out["bfm"] = mat
    return out
