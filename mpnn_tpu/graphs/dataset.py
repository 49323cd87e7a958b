"""Dataset loaders: CSV → molecules → encoded MolGraphs (+ cache).

Reference semantics (pre_process/load_dataset.py:86-167): read CSV, parse
each molecule (skip unparseable rows), sanitize, featurize, fit encoders on
the FULL dataset, encode, attach labels. Four task flavors: classification,
number (regression), affinity, ECFP multi-label.

Caching: the reference np.savez_compressed's pickled graph objects
(test.py:56-74); we cache to an .npz of flat arrays + the GraphEncoder JSON —
no pickle, versioned, loadable without the chem layer.
"""

from __future__ import annotations

import io
import json
import os
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from mpnn_tpu.chem import mol_from_smiles
from mpnn_tpu.chem.ecfp import ecfp_bits_per_atom
from mpnn_tpu.chem.featurize import FEATURIZER_VERSION
from mpnn_tpu.graphs.encoders import GraphEncoder, LabelEncoder
from mpnn_tpu.graphs.graph import MolGraph, from_mol

CACHE_VERSION = 1


def _read_csv_columns(path: str, columns: Sequence[str]):
    import pandas as pd
    df = pd.read_csv(path)
    return [df[c].values for c in columns]


def generate_molgraphs(mol_strs, labels=None, affinities=None,
                       parser: Callable = mol_from_smiles,
                       edge_types: bool = False) -> List[MolGraph]:
    """edge_types=True derives GGNN bond-type ids (attach_edge_types) —
    must happen here, before encode() one-hots the raw bond orders."""
    graphs = []
    n = len(mol_strs)
    labels = labels if labels is not None else [None] * n
    affinities = affinities if affinities is not None else [None] * n
    for s, lab, aff in zip(mol_strs, labels, affinities):
        mol = parser(s)
        if mol is None:
            continue
        graphs.append(from_mol(mol, label=lab, affinity=aff))
    if edge_types:
        from mpnn_tpu.graphs.graph import attach_edge_types
        attach_edge_types(graphs)
    return graphs


def fit_encoders(graphs: List[MolGraph]) -> GraphEncoder:
    """Fit atom/bond encoders over the whole dataset
    (load_dataset.py:59-84)."""
    ge = GraphEncoder()
    all_afm = np.vstack([g.afm for g in graphs])
    all_nafm = np.vstack([g.nafm for g in graphs])
    ge.fit_atoms(all_afm, all_nafm)
    nfe = graphs[0].bfm.shape[-1]
    all_bfm = np.vstack([g.bfm.reshape(-1, nfe) for g in graphs])
    adj_mask = np.concatenate([g.adj.reshape(-1) for g in graphs]) == 1
    ge.fit_bonds(all_bfm, adj_mask)
    return ge


def encode_molgraphs(graphs: List[MolGraph],
                     ge: Optional[GraphEncoder] = None
                     ) -> Tuple[List[MolGraph], GraphEncoder]:
    if ge is None:
        ge = fit_encoders(graphs)
    for g in graphs:
        g.encode(ge)
    return graphs, ge


# ---------------------------------------------------------------------------
# task-flavored loaders
# ---------------------------------------------------------------------------

def load_classification_dataset(path: str, mol_col: str, label_col: str,
                                parser=mol_from_smiles,
                                ge: Optional[GraphEncoder] = None,
                                edge_types: bool = False):
    """→ (graphs, n_classes, encoded_labels, graph_encoder)."""
    mols, labels = _read_csv_columns(path, [mol_col, label_col])
    graphs = generate_molgraphs(mols, labels, parser=parser,
                                edge_types=edge_types)
    graphs, ge = encode_molgraphs(graphs, ge)
    le = LabelEncoder()
    encoded = le.fit_transform([g.label for g in graphs])
    ge.label_enc = le
    for g, lab in zip(graphs, encoded):
        g.label = int(lab)
    return graphs, int(encoded.max()) + 1, encoded, ge


def load_number_dataset(path: str, mol_col: str, label_col: str,
                        parser=mol_from_smiles,
                        ge: Optional[GraphEncoder] = None,
                        edge_types: bool = False):
    """Regression: labels kept as floats (load_dataset.py:160-167)."""
    mols, labels = _read_csv_columns(path, [mol_col, label_col])
    graphs = generate_molgraphs(mols, labels, parser=parser,
                                edge_types=edge_types)
    graphs, ge = encode_molgraphs(graphs, ge)
    for g in graphs:
        g.label = float(g.label)
    return graphs, ge


def load_affinity_dataset(path: str, mol_col: str, label_col: str,
                          affinity_col: str, parser=mol_from_smiles,
                          ge: Optional[GraphEncoder] = None,
                          edge_types: bool = False):
    """Classification labels + per-graph affinity value
    (load_dataset.py:135-157)."""
    mols, labels, aff = _read_csv_columns(
        path, [mol_col, label_col, affinity_col])
    graphs = generate_molgraphs(mols, labels, affinities=aff, parser=parser,
                                edge_types=edge_types)
    graphs, ge = encode_molgraphs(graphs, ge)
    le = LabelEncoder()
    encoded = le.fit_transform([g.label for g in graphs])
    ge.label_enc = le
    for g, lab in zip(graphs, encoded):
        g.label = int(lab)
    return graphs, int(encoded.max()) + 1, encoded, ge


def load_ecfp_dataset(path: str, mol_col: str, label_col: str,
                      parser=mol_from_smiles, nbits: int = 16384,
                      radius: int = 3, ge: Optional[GraphEncoder] = None):
    """Labels := per-atom Morgan bit matrices (load_dataset.py:123-132)."""
    mols, labels = _read_csv_columns(path, [mol_col, label_col])
    out = []
    for s, lab in zip(mols, labels):
        mol = parser(s)
        if mol is None:
            continue
        g = from_mol(mol, label=lab)
        g.label = ecfp_bits_per_atom(mol, radius=radius, nbits=nbits)
        out.append(g)
    out, ge = encode_molgraphs(out, ge)
    return out, ge


# ---------------------------------------------------------------------------
# cache
# ---------------------------------------------------------------------------

def save_cache(path: str, graphs: List[MolGraph], ge: GraphEncoder,
               meta: Optional[dict] = None):
    """Flat-array .npz cache of encoded graphs + encoder JSON."""
    arrays = {}
    offsets_a, offsets_e = [0], [0]
    for g in graphs:
        offsets_a.append(offsets_a[-1] + g.num_atoms)
        offsets_e.append(offsets_e[-1] + g.num_edges)
    arrays["afm"] = np.concatenate([g.afm for g in graphs])
    arrays["nafm"] = np.concatenate([g.nafm for g in graphs])
    arrays["edge_feats"] = np.concatenate([g.edge_feats for g in graphs])
    arrays["edge_src"] = np.concatenate([g.edge_src for g in graphs])
    arrays["edge_dst"] = np.concatenate([g.edge_dst for g in graphs])
    if all(hasattr(g, "edge_types") for g in graphs):
        # GGNN bond-type ids (graphs.attach_edge_types) ride the cache so
        # a cached-featurization run stays GGNN-trainable
        arrays["edge_types"] = np.concatenate(
            [g.edge_types for g in graphs])
    arrays["offsets_a"] = np.asarray(offsets_a, np.int64)
    arrays["offsets_e"] = np.asarray(offsets_e, np.int64)
    labels = np.stack([np.asarray(g.label, np.float32) for g in graphs]) \
        if graphs[0].label is not None else np.zeros((len(graphs),))
    arrays["labels"] = labels
    affinities = np.asarray(
        [g.affinity if g.affinity is not None else np.nan for g in graphs],
        np.float32)
    arrays["affinities"] = affinities
    arrays["meta"] = np.frombuffer(json.dumps({
        "version": CACHE_VERSION,
        "featurizer": FEATURIZER_VERSION,
        "encoder": json.loads(ge.to_json()),
        "is_encoded": all(g.is_encoded for g in graphs),
        **(meta or {}),
    }).encode(), np.uint8)
    np.savez_compressed(path, **arrays)


def load_cache(path: str) -> Tuple[List[MolGraph], GraphEncoder, dict]:
    with np.load(path) as f:
        meta = json.loads(bytes(f["meta"]).decode())
        if meta["version"] != CACHE_VERSION:
            raise ValueError(f"cache version {meta['version']} != "
                             f"{CACHE_VERSION}")
        # perception-semantics guard: a cache featurized under different
        # chem semantics (absent key = pre-v2) would silently mismatch
        # checkpoints trained on freshly-featurized data
        cached_fv = meta.get("featurizer", 1)
        if cached_fv != FEATURIZER_VERSION:
            raise ValueError(
                f"cache was featurized with perception version {cached_fv} "
                f"!= current {FEATURIZER_VERSION} "
                "(chem feature values changed); re-featurize the CSV")
        ge = GraphEncoder.from_json(json.dumps(meta["encoder"]))
        oa, oe = f["offsets_a"], f["offsets_e"]
        graphs = []
        for i in range(len(oa) - 1):
            a0, a1 = int(oa[i]), int(oa[i + 1])
            e0, e1 = int(oe[i]), int(oe[i + 1])
            na = a1 - a0
            src = f["edge_src"][e0:e1]
            dst = f["edge_dst"][e0:e1]
            feats = f["edge_feats"][e0:e1]
            fe = feats.shape[-1]
            bfm = np.zeros((na, na, fe), feats.dtype)
            adj = np.zeros((na, na), np.int64)
            bfm[src, dst] = feats
            adj[src, dst] = 1
            aff = float(f["affinities"][i])
            g = MolGraph(
                afm=f["afm"][a0:a1], nafm=f["nafm"][a0:a1],
                bfm=bfm, adj=adj, edge_src=src, edge_dst=dst,
                edge_feats=feats, label=f["labels"][i],
                affinity=None if np.isnan(aff) else aff,
                is_encoded=meta["is_encoded"])
            if "edge_types" in f:
                g.edge_types = f["edge_types"][e0:e1]
                mat = np.zeros_like(g.adj, dtype=np.int32)
                mat[src, dst] = g.edge_types
                g.bond_type_matrix = mat
            graphs.append(g)
    return graphs, ge, meta
