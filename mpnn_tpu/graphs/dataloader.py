"""Batching iterators: shuffle + bucketed static-shape batches.

Replaces torch DataLoader(GraphDataSet, collate_fn) (data_loader.py:91-104,
test.py:115). Dense batch SHAPES always round up to size buckets (bounded
compile count, SURVEY.md §7); packed batches use one fixed shape per run.

`bucketed` controls only the batch COMPOSITION: True groups same-bucket
graphs (minimum padding waste), False (default) keeps the reference's pure
random composition. Default False is deliberate — size-homogeneous batches
make the masked BatchNorm statistics non-stationary across steps, which
stalls the BN-heavy flagship config (train loss 2.9 vs 0.58 after 6 epochs
on the synthetic lipo task). Opt into True for BN-free models where padding
FLOPs dominate.
"""

from __future__ import annotations

from typing import Iterator, List, Sequence

import numpy as np

from mpnn_tpu.graphs.batching import (
    DEFAULT_NODE_BUCKETS, attach_edge_vocab, bucket_for, collate_dense,
    collate_packed,
)
from mpnn_tpu.graphs.graph import MolGraph


class GraphLoader:
    """Iterates dicts of numpy arrays (feed to device with jnp.asarray or
    jax.device_put under a sharding)."""

    def __init__(self, graphs: List[MolGraph], batch_size: int,
                 shuffle: bool = False, seed: int = 317,
                 collate: str = "dense",
                 bucketed: bool = False,
                 buckets: Sequence[int] = DEFAULT_NODE_BUCKETS,
                 drop_last: bool = False,
                 with_nafm: bool = True,
                 use_native: bool = True,
                 fixed_packed_caps: bool = True,
                 edge_vocab: bool = True,
                 spmm_plan: bool = False,
                 spmm_block_edges: int = 512,
                 spmm_align: int = 16,
                 segment_slots: bool = False,
                 fused_step_plan: bool = False):
        self.graphs = graphs
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)
        self.collate = collate
        self.bucketed = bucketed
        self.buckets = buckets
        self.drop_last = drop_last
        self.with_nafm = with_nafm
        # per-ATOM matrix labels (the ECFP task): packed batches carry
        # them node-space as 'node_labels' (collate_packed); the native
        # packers only know scalar/per-graph labels, so fall back to the
        # python collate for this task
        self._node_space_labels = bool(graphs) \
            and graphs[0].label is not None \
            and np.asarray(graphs[0].label).ndim == 2 \
            and (np.asarray(graphs[0].label).shape[0]
                 == graphs[0].num_atoms)
        if use_native:
            from mpnn_tpu import native
            use_native = native.available() \
                and not self._node_space_labels
        self.use_native = use_native
        # ONE packed shape for the whole run: cap = the worst possible batch
        # (top-batch_size graphs by node/edge count). Per-batch caps would
        # trigger a recompile per distinct shape — minutes each on a TPU
        # tunnel (measured in scripts/scale_smoke.py).
        self._packed_caps = None
        if fixed_packed_caps and collate == "packed" and graphs:
            a = sorted((g.num_atoms for g in graphs), reverse=True)
            e = sorted((g.num_edges for g in graphs), reverse=True)
            self._packed_caps = (
                bucket_for(sum(a[:batch_size]) + 1),
                bucket_for(max(sum(e[:batch_size]), 1)))
        # ONE edge-vocab capacity for the whole run (a per-batch cap would
        # be a recompile per distinct cap): the dataset-wide distinct
        # edge-feature rows bound every batch's vocabulary
        self._vocab_cap = None
        self._vocab_rows = None
        self._vocab_vids = None
        if edge_vocab and collate == "packed" and graphs:
            from mpnn_tpu.graphs.batching import build_edge_vocab
            efs = [g.edge_feats for g in graphs if g.num_edges]
            # +1 for the all-zero padding row (absent in real edges);
            # an edgeless dataset (single-atom molecules) has just that row
            n_distinct = (np.unique(np.concatenate(efs, axis=0),
                                    axis=0).shape[0] + 1) if efs else 1
            if n_distinct <= 64:
                self._vocab_cap = max(8, bucket_for(n_distinct))
                # dataset-wide vocab table + cached per-graph vid arrays:
                # per-batch attach becomes pure concatenation (the old
                # np.unique argsort was ~29 ms/batch — the dominant host
                # collation cost)
                self._vocab_rows, self._vocab_vids = build_edge_vocab(
                    graphs, self._vocab_cap)
        # Scatter-free segment tables (ops/segments.py): slot widths are
        # dataset-wide maxima (max atoms per graph / max node degree) so
        # every batch shares ONE compiled shape; degree is a per-graph
        # property, so no batch can overflow the caps. OPT-IN: measured
        # SLOWER than XLA's scatters at bench shapes on 1× v5e (flagship
        # batch 1024: 0.652 vs 0.591 ms/step kernel path, 1.64 vs 1.41
        # XLA path) — the padded gather expansion costs more than the
        # scatters it removes. Kept for shapes where scatter dominates.
        self._slot_caps = None
        if segment_slots and collate == "packed" and graphs:
            node_slot_cap = max(g.num_atoms for g in graphs)
            deg = 1
            for g in graphs:
                if g.num_edges:
                    deg = max(deg,
                              int(np.bincount(g.edge_dst).max()),
                              int(np.bincount(g.edge_src).max()))
            self._slot_caps = (node_slot_cap, deg)
        # Pallas-SpMM window plan (kernels/spmm.py): ONE static
        # (block_edges, window) for the whole run so every batch compiles
        # once; per-batch win_start arrays ride in the batch dict
        self.spmm_block_edges = None
        self.spmm_window = None
        self.spmm_align = spmm_align
        if spmm_plan and collate == "packed" and self._vocab_cap:
            self.spmm_block_edges = spmm_block_edges
            # window = block size covers molecular locality (a block of E
            # consecutive edges spans ≈ E/2 nodes + one graph of slack);
            # batches whose plan misses the window fall back to XLA
            self.spmm_window = spmm_block_edges
        # Whole-step fused kernel plan (kernels/fused_step.py): coarse
        # 512-size buckets keep the distinct compiled shapes per run to
        # ~1-2 (random batch composition concentrates the window spans).
        # Needs per-edge A-matrix ids: the edge vocab (edge_network) OR
        # bond-type ids on the graphs (GGNN — no vocab required).
        have_types = bool(graphs) and all(
            hasattr(g, "edge_types") for g in graphs)
        self.fused_step_plan = (fused_step_plan and collate == "packed"
                                and (self._vocab_cap is not None
                                     or have_types))
        # Dataset-wide FLAT STORE for the native gather-packer: the whole
        # per-batch collation (incl. vocab ids and GGNN types) becomes one
        # C++ memcpy pass — measured 6.9 → ~1 ms/batch at batch 1024
        self._flat_store = None
        if self.use_native and collate == "packed" and graphs:
            from mpnn_tpu import native
            self._flat_store = native.build_flat_store(
                graphs, vids=self._vocab_vids)

    def __len__(self):
        n = len(self.graphs)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _order(self) -> np.ndarray:
        idx = np.arange(len(self.graphs))
        if self.shuffle:
            self.rng.shuffle(idx)
        # Packed batches have ONE fixed shape per run (fixed_packed_caps),
        # so grouping by size buys nothing — and size-sorted batches are
        # actively harmful: their homogeneous composition makes the masked
        # BatchNorm statistics non-stationary across steps, which stalls
        # the BN-heavy flagship config (measured: train loss 2.9 vs 0.58
        # after 6 epochs). Keep the pure shuffle for packed collation.
        if self.bucketed and self.collate != "packed":
            # dense: graphs must share a bucket within a batch for static
            # shapes — but the BATCH ORDER is re-shuffled so consecutive
            # steps still mix sizes
            keys = np.asarray([bucket_for(self.graphs[i].num_atoms,
                                          self.buckets) for i in idx])
            idx = idx[np.argsort(keys, kind="stable")]
            bs = self.batch_size
            # shuffle FULL batch-size groups only and keep the partial
            # group last: __iter__ re-chunks by fixed batch_size, so a
            # partial group mid-stream would shift every later chunk
            # boundary and silently mix buckets within a batch
            groups = [idx[s:s + bs] for s in range(0, len(idx), bs)]
            full = [g for g in groups if len(g) == bs]
            part = [g for g in groups if len(g) < bs]
            if self.shuffle:
                self.rng.shuffle(full)
            idx = np.concatenate(full + part) if (full or part) else idx
        return idx

    def _epoch_chunks(self):
        """Per-epoch list of index chunks (order logic applied once)."""
        idx = self._order()
        bs = self.batch_size
        out = []
        for s in range(0, len(idx), bs):
            idx_chunk = idx[s:s + bs]
            if self.drop_last and len(idx_chunk) < bs:
                break
            out.append(idx_chunk)
        return out

    def __iter__(self) -> Iterator[dict]:
        for idx_chunk in self._epoch_chunks():
            yield self._collate_chunk(idx_chunk)

    def _collate_chunk(self, idx_chunk) -> dict:
        """Collate one chunk of graph indices into a batch dict — pure
        (no loader state mutation), so PrefetchLoader workers may run it
        concurrently."""
        chunk = [self.graphs[i] for i in idx_chunk]
        if self.collate == "dense":
            # shapes ALWAYS bucket (bounded compile count) — `bucketed`
            # only controls whether the ORDERING groups sizes
            cap = max(bucket_for(g.num_atoms, self.buckets)
                      for g in chunk)
            if self.use_native:
                from mpnn_tpu import native
                batch = native.pack_dense_native(chunk, n_cap=cap)
                if not self.with_nafm:
                    batch.pop("nafm")
                return batch
            return collate_dense(chunk, num_nodes=cap,
                                 with_nafm=self.with_nafm)
        elif self.collate == "packed":
            if self._packed_caps is not None:
                node_cap, edge_cap = self._packed_caps
            else:
                node_cap = bucket_for(
                    sum(g.num_atoms for g in chunk) + 1)
                edge_cap = bucket_for(
                    sum(g.num_edges for g in chunk))
            # graph-slot count stays the true chunk size (only the
            # final partial batch adds a second compiled shape)
            if self._flat_store is not None:
                # one C++ memcpy pass from the dataset-wide flat store
                # (emits edge_vid / edge_types directly)
                from mpnn_tpu import native
                batch = native.pack_batch_gather_native(
                    self._flat_store, idx_chunk, node_cap=node_cap,
                    edge_cap=edge_cap)
            elif self.use_native:
                from mpnn_tpu import native
                batch = native.pack_batch_native(
                    chunk, node_cap=node_cap, edge_cap=edge_cap)
            else:
                batch = collate_packed(chunk, node_cap=node_cap,
                                       edge_cap=edge_cap).as_dict()
            if self._vocab_vids is not None:
                # cached dataset-wide vocab: the vid array either came
                # straight from the flat store or is a pure concatenation;
                # vfirst is an int-array first-occurrence scan (the old
                # per-batch row-wise np.unique argsort was ~29 ms — the
                # dominant host collation cost)
                if "edge_vid" in batch:
                    vid = batch["edge_vid"]
                else:
                    vid = np.zeros(batch["edge_src"].shape[0], np.int32)
                    off = 0
                    for i in idx_chunk:
                        v = self._vocab_vids[i]
                        vid[off:off + v.shape[0]] = v
                        off += v.shape[0]
                vfirst = np.zeros((self._vocab_cap,), np.int32)
                present, first = np.unique(vid, return_index=True)
                # ids absent from this batch keep index 0: they gather
                # the zero row, and no edge carries them — unused
                vfirst[present] = first
                batch = dict(batch)
                batch["edge_vid"] = vid
                batch["edge_vfirst"] = vfirst
            elif self._vocab_cap is not None:
                batch = attach_edge_vocab(batch, self._vocab_cap)
            if "edge_types" not in batch \
                    and all(hasattr(g, "edge_types") for g in chunk):
                # GGNN inputs ride along whenever the graphs carry
                # bond-type ids (graphs.attach_edge_types): packed
                # 'edge_types' aligned with edge_src/dst, pad edges = 0
                from mpnn_tpu.graphs.batching import with_edge_types
                batch = with_edge_types(batch, chunk)
            if self._slot_caps is not None:
                from mpnn_tpu.ops.segments import attach_segment_slots
                batch = attach_segment_slots(
                    batch, node_slot_cap=self._slot_caps[0],
                    edge_slot_cap=self._slot_caps[1])
            if self.spmm_window is not None and "edge_vid" in batch:
                from mpnn_tpu.kernels.spmm import plan_edge_windows
                plan = plan_edge_windows(
                    batch["edge_src"], batch["edge_dst"],
                    batch["edge_mask"], batch["node_feats"].shape[0],
                    self.spmm_block_edges, window=self.spmm_window,
                    align=self.spmm_align)
                if plan is not None:
                    batch["spmm_win"] = plan.win_start
            if self.fused_step_plan and ("edge_vid" in batch
                                         or "edge_types" in batch):
                from mpnn_tpu.kernels.fused_step import attach_fused_plan
                batch = attach_fused_plan(batch, size_bucket=512)
            return batch
        raise ValueError(self.collate)


class PrefetchLoader:
    """Wraps a GraphLoader with background prefetch so host collation
    overlaps device compute (the input-pipeline overlap the reference's
    synchronous DataLoader lacks).

    workers=1 (default): one producer thread running the loader as-is.
    workers>1: a thread pool collates chunks CONCURRENTLY with order
    preserved (epoch order/shuffle semantics identical — chunk index
    lists come from the loader's own _epoch_chunks()). Measured honest:
    at batch-1024 molecular shapes the pool is a WASH (~6.5 ms/batch
    either way) — the python/numpy collation glue holds the GIL; only
    the ctypes native packer releases it. Useful when `to_device` or
    custom per-batch transforms dominate (those do release the GIL)."""

    def __init__(self, loader: GraphLoader, prefetch: int = 2,
                 to_device=None, workers: int = 1):
        self.loader = loader
        self.prefetch = prefetch
        self.to_device = to_device      # optional fn(batch) → device batch
        self.workers = workers

    def __len__(self):
        return len(self.loader)

    def _iter_pool(self):
        from concurrent.futures import ThreadPoolExecutor
        import collections
        depth = max(self.prefetch, self.workers)
        with ThreadPoolExecutor(max_workers=self.workers) as pool:
            chunks = self.loader._epoch_chunks()
            pending = collections.deque()
            ci = 0
            while ci < len(chunks) or pending:
                while ci < len(chunks) and len(pending) < depth:
                    pending.append(
                        pool.submit(self.loader._collate_chunk, chunks[ci]))
                    ci += 1
                batch = pending.popleft().result()   # ordered
                if self.to_device is not None:
                    batch = self.to_device(batch)
                yield batch

    def __iter__(self):
        if self.workers > 1:
            yield from self._iter_pool()
            return
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        _END = object()
        error = []

        def producer():
            try:
                for batch in self.loader:
                    if self.to_device is not None:
                        batch = self.to_device(batch)
                    q.put(batch)
            except BaseException as e:   # propagate, don't truncate silently
                error.append(e)
            finally:
                q.put(_END)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _END:
                break
            yield item
        t.join()
        if error:
            raise error[0]
