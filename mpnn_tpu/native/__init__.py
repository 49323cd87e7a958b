"""Native (C++) batch packer with ctypes bindings.

Builds packer.cpp with g++ into a cached shared library at first use;
`available()` gates callers so the numpy path (graphs/batching.py) remains
the fallback and the parity oracle.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False


def _so_path() -> str:
    cache = os.environ.get("MPNN_TPU_NATIVE_CACHE",
                           os.path.join(tempfile.gettempdir(),
                                        "mpnn_tpu_native"))
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, "libpacker.so")


def _build() -> Optional[str]:
    src = os.path.join(os.path.dirname(__file__), "packer.cpp")
    so = _so_path()
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", so],
            check=True, capture_output=True, timeout=120)
        return so
    except Exception:
        return None


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    f32 = ctypes.POINTER(ctypes.c_float)
    i32 = ctypes.POINTER(ctypes.c_int32)
    i64 = ctypes.POINTER(ctypes.c_int64)
    lib.pack_batch.restype = ctypes.c_int
    lib.pack_batch.argtypes = [f32, f32, f32, i32, i32, i64, i64,
                               ctypes.c_int, ctypes.c_int, ctypes.c_int,
                               ctypes.c_int, ctypes.c_int, ctypes.c_int,
                               ctypes.c_int,
                               f32, f32, f32, i32, i32, i32, f32, f32, f32]
    lib.pack_dense.restype = ctypes.c_int
    lib.pack_dense.argtypes = [f32, f32, f32, i32, i32, i64, i64,
                               ctypes.c_int, ctypes.c_int, ctypes.c_int,
                               ctypes.c_int, ctypes.c_int,
                               f32, f32, f32, f32, f32]
    lib.pack_batch_gather.restype = ctypes.c_int
    lib.pack_batch_gather.argtypes = [
        f32, f32, f32, i32, i32, i32, i32, i64, i64, i32,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32, f32, f32, i32, i32, i32, f32, f32, f32, i32, i32]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def _flatten_graphs(graphs):
    offsets_a, offsets_e = [0], [0]
    for g in graphs:
        offsets_a.append(offsets_a[-1] + g.num_atoms)
        offsets_e.append(offsets_e[-1] + g.num_edges)
    afm = np.ascontiguousarray(
        np.concatenate([g.afm for g in graphs]), np.float32)
    nafm = np.ascontiguousarray(
        np.concatenate([g.nafm for g in graphs]), np.float32)
    feats = np.ascontiguousarray(
        np.concatenate([g.edge_feats for g in graphs]), np.float32)
    src = np.ascontiguousarray(
        np.concatenate([g.edge_src for g in graphs]), np.int32)
    dst = np.ascontiguousarray(
        np.concatenate([g.edge_dst for g in graphs]), np.int32)
    return (afm, nafm, feats, src, dst,
            np.asarray(offsets_a, np.int64), np.asarray(offsets_e, np.int64))


def pack_batch_native(graphs, node_cap: int, edge_cap: int,
                      num_graphs: Optional[int] = None) -> dict:
    """Native collate_packed — same output dict as
    graphs.collate_packed(...).as_dict()."""
    lib = _load()
    assert lib is not None, "native packer unavailable"
    afm, nafm, feats, src, dst, oa, oe = _flatten_graphs(graphs)
    ng = num_graphs or len(graphs)
    assert ng >= len(graphs), (
        f"num_graphs={ng} < len(graphs)={len(graphs)}: graph_mask would "
        "overflow (numpy fallback raises IndexError for the same input)")
    fa, fn, fe = afm.shape[1], nafm.shape[1], feats.shape[1]

    node_feats = np.empty((node_cap, fa), np.float32)
    node_nafm = np.empty((node_cap, fn), np.float32)
    node_mask = np.empty((node_cap, 1), np.float32)
    node_graph = np.empty((node_cap,), np.int32)
    out_src = np.empty((edge_cap,), np.int32)
    out_dst = np.empty((edge_cap,), np.int32)
    out_efeats = np.empty((edge_cap, fe), np.float32)
    out_emask = np.empty((edge_cap,), np.float32)
    graph_mask = np.empty((ng,), np.float32)

    rc = lib.pack_batch(
        _ptr(afm, ctypes.c_float), _ptr(nafm, ctypes.c_float),
        _ptr(feats, ctypes.c_float), _ptr(src, ctypes.c_int32),
        _ptr(dst, ctypes.c_int32), _ptr(oa, ctypes.c_int64),
        _ptr(oe, ctypes.c_int64),
        len(graphs), fa, fn, fe, node_cap, edge_cap, ng,
        _ptr(node_feats, ctypes.c_float), _ptr(node_nafm, ctypes.c_float),
        _ptr(node_mask, ctypes.c_float), _ptr(node_graph, ctypes.c_int32),
        _ptr(out_src, ctypes.c_int32), _ptr(out_dst, ctypes.c_int32),
        _ptr(out_efeats, ctypes.c_float), _ptr(out_emask, ctypes.c_float),
        _ptr(graph_mask, ctypes.c_float))
    if rc != 0:
        raise ValueError("batch exceeds packed capacity")

    labels = np.stack([np.asarray(g.label) for g in graphs]) \
        if graphs[0].label is not None else np.zeros((len(graphs),))
    if labels.shape[0] < ng:
        labels = np.concatenate(
            [labels, np.zeros((ng - labels.shape[0],) + labels.shape[1:],
                              labels.dtype)])
    return {
        "node_feats": node_feats, "node_nafm": node_nafm,
        "node_mask": node_mask, "node_graph": node_graph,
        "edge_src": out_src, "edge_dst": out_dst,
        "edge_feats": out_efeats, "edge_mask": out_emask,
        "labels": labels, "graph_mask": graph_mask, "num_graphs": ng,
    }


def pack_dense_native(graphs, n_cap: int) -> dict:
    lib = _load()
    assert lib is not None, "native packer unavailable"
    afm, nafm, feats, src, dst, oa, oe = _flatten_graphs(graphs)
    b = len(graphs)
    fa, fn, fe = afm.shape[1], nafm.shape[1], feats.shape[1]
    out_afm = np.empty((b, n_cap, fa), np.float32)
    out_nafm = np.empty((b, n_cap, fn), np.float32)
    out_bfm = np.empty((b, n_cap, n_cap, fe), np.float32)
    out_adj = np.empty((b, n_cap, n_cap), np.float32)
    out_mask = np.empty((b, n_cap, 1), np.float32)
    rc = lib.pack_dense(
        _ptr(afm, ctypes.c_float), _ptr(nafm, ctypes.c_float),
        _ptr(feats, ctypes.c_float), _ptr(src, ctypes.c_int32),
        _ptr(dst, ctypes.c_int32), _ptr(oa, ctypes.c_int64),
        _ptr(oe, ctypes.c_int64), b, fa, fn, fe, n_cap,
        _ptr(out_afm, ctypes.c_float), _ptr(out_nafm, ctypes.c_float),
        _ptr(out_bfm, ctypes.c_float), _ptr(out_adj, ctypes.c_float),
        _ptr(out_mask, ctypes.c_float))
    if rc != 0:
        raise ValueError(f"graph exceeds capacity {n_cap}")
    labels = _collect_labels(graphs, n_cap)
    return {"afm": out_afm, "nafm": out_nafm, "bfm": out_bfm,
            "adj": out_adj, "mask": out_mask, "labels": labels}


def _collect_labels(graphs, n_cap):
    """Scalar labels stack; per-atom matrix labels (ECFP) pad along atoms
    (data_loader.py:72-88 semantics)."""
    first = np.asarray(graphs[0].label)
    if first.ndim == 2:
        nbits = first.shape[-1]
        labels = np.zeros((len(graphs), n_cap, nbits), np.float32)
        for i, g in enumerate(graphs):
            labels[i, :g.num_atoms] = g.label
        return labels
    return np.asarray([g.label for g in graphs])


class FlatStore:
    """Dataset-wide flat arrays, built ONCE per run, consumed by
    pack_batch_gather_native: the per-batch host cost becomes pure C++
    memcpy (GIL released) instead of per-call Python flattening."""

    def __init__(self, graphs, vids=None):
        (self.afm, self.nafm, self.feats, self.src, self.dst,
         self.oa, self.oe) = _flatten_graphs(graphs)
        self.vids = None
        if vids is not None:
            self.vids = np.ascontiguousarray(
                np.concatenate([np.asarray(v, np.int32) for v in vids])
                if vids else np.zeros((0,), np.int32))
            assert self.vids.shape[0] == self.oe[-1]
        self.types = None
        if graphs and all(hasattr(g, "edge_types") for g in graphs):
            self.types = np.ascontiguousarray(np.concatenate(
                [np.asarray(g.edge_types, np.int32) for g in graphs])
                if graphs else np.zeros((0,), np.int32))
        # labels must stack (ragged per-graph labels → caller falls back)
        self.labels = None
        if graphs and graphs[0].label is not None:
            self.labels = np.stack([np.asarray(g.label) for g in graphs])


def build_flat_store(graphs, vids=None):
    """FlatStore or None (native lib unavailable / ragged labels)."""
    if _load() is None or not graphs:
        return None
    try:
        return FlatStore(graphs, vids=vids)
    except (ValueError, TypeError):  # ragged labels (per-atom matrices)
        return None


def pack_batch_gather_native(store: FlatStore, sel, node_cap: int,
                             edge_cap: int,
                             num_graphs: Optional[int] = None) -> dict:
    """Native gather-collate from a FlatStore — same output dict as
    collate_packed(...).as_dict() (+ 'edge_vid'/'edge_types' when the
    store carries them)."""
    lib = _load()
    assert lib is not None, "native packer unavailable"
    sel = np.ascontiguousarray(np.asarray(sel, np.int32))
    n_sel = int(sel.shape[0])
    ng = num_graphs or n_sel
    assert ng >= n_sel
    fa, fn, fe = (store.afm.shape[1], store.nafm.shape[1],
                  store.feats.shape[1])
    node_feats = np.empty((node_cap, fa), np.float32)
    node_nafm = np.empty((node_cap, fn), np.float32)
    node_mask = np.empty((node_cap, 1), np.float32)
    node_graph = np.empty((node_cap,), np.int32)
    out_src = np.empty((edge_cap,), np.int32)
    out_dst = np.empty((edge_cap,), np.int32)
    out_efeats = np.empty((edge_cap, fe), np.float32)
    out_emask = np.empty((edge_cap,), np.float32)
    graph_mask = np.empty((ng,), np.float32)
    out_vid = np.empty((edge_cap,), np.int32) \
        if store.vids is not None else None
    out_types = np.empty((edge_cap,), np.int32) \
        if store.types is not None else None
    null_i32 = ctypes.POINTER(ctypes.c_int32)()
    rc = lib.pack_batch_gather(
        _ptr(store.afm, ctypes.c_float), _ptr(store.nafm, ctypes.c_float),
        _ptr(store.feats, ctypes.c_float), _ptr(store.src, ctypes.c_int32),
        _ptr(store.dst, ctypes.c_int32),
        _ptr(store.vids, ctypes.c_int32) if out_vid is not None
        else null_i32,
        _ptr(store.types, ctypes.c_int32) if out_types is not None
        else null_i32,
        _ptr(store.oa, ctypes.c_int64), _ptr(store.oe, ctypes.c_int64),
        _ptr(sel, ctypes.c_int32), n_sel, fa, fn, fe,
        node_cap, edge_cap, ng,
        _ptr(node_feats, ctypes.c_float), _ptr(node_nafm, ctypes.c_float),
        _ptr(node_mask, ctypes.c_float), _ptr(node_graph, ctypes.c_int32),
        _ptr(out_src, ctypes.c_int32), _ptr(out_dst, ctypes.c_int32),
        _ptr(out_efeats, ctypes.c_float), _ptr(out_emask, ctypes.c_float),
        _ptr(graph_mask, ctypes.c_float),
        _ptr(out_vid, ctypes.c_int32) if out_vid is not None else null_i32,
        _ptr(out_types, ctypes.c_int32) if out_types is not None
        else null_i32)
    if rc != 0:
        raise ValueError("batch exceeds packed capacity")
    if store.labels is not None:
        labels = store.labels[sel]
        if labels.shape[0] < ng:
            labels = np.concatenate(
                [labels,
                 np.zeros((ng - labels.shape[0],) + labels.shape[1:],
                          labels.dtype)])
    else:
        labels = np.zeros((ng,))
    out = {
        "node_feats": node_feats, "node_nafm": node_nafm,
        "node_mask": node_mask, "node_graph": node_graph,
        "edge_src": out_src, "edge_dst": out_dst,
        "edge_feats": out_efeats, "edge_mask": out_emask,
        "labels": labels, "graph_mask": graph_mask, "num_graphs": ng,
    }
    if out_vid is not None:
        out["edge_vid"] = out_vid
    if out_types is not None:
        out["edge_types"] = out_types
    return out
