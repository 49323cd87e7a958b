"""Dataset filtering / relabeling utilities matching the reference drivers.

  * filter_by_label_count — keep only classes whose sample count passes
    cutoffs, relabel to a dense 0..K-1 range (test_lipo.py:25-45 /
    test_graph_encode_norm.py:25-46: lower/upper count cutoffs, optional
    "first 4 passing classes" cap).
  * binarize_target — one-vs-rest labels for a single target class
    (test_single_target.py:101, target 243).
  * affinity_labels — label := affinity where label == target_class else a
    constant (test_graph_encode_affinity.py:126-128).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from mpnn_tpu.graphs.graph import MolGraph


def filter_by_label_count(graphs: List[MolGraph],
                          lower_cutoff: Optional[int] = None,
                          upper_cutoff: Optional[int] = None,
                          keep_first: Optional[int] = None
                          ) -> Tuple[List[MolGraph], List[int], int]:
    """Returns (filtered graphs with relabeled .label, new labels,
    n_classes)."""
    labels = np.asarray([g.label for g in graphs])
    uniq, count = np.unique(labels, return_counts=True)
    mask = np.ones_like(uniq, dtype=bool)
    if lower_cutoff is not None:
        mask = count > lower_cutoff
    if upper_cutoff is not None:
        mask = np.logical_and(mask, count < upper_cutoff)
    if keep_first is not None:
        positive = np.argwhere(mask).reshape(-1)[:keep_first]
        mask = np.zeros_like(uniq, dtype=bool)
        mask[positive] = True
    keep = set(uniq[mask].tolist())
    relabel = {lab: i for i, lab in enumerate(sorted(keep))}
    out, new_labels = [], []
    for g in graphs:
        if g.label in keep:
            g.label = relabel[g.label]
            new_labels.append(g.label)
            out.append(g)
    return out, new_labels, len(keep)


def binarize_target(graphs: List[MolGraph], target) -> List[MolGraph]:
    """label ← 1 if label == target else 0 (one-vs-rest)."""
    for g in graphs:
        g.label = int(g.label == target)
    return graphs


def affinity_labels(graphs: List[MolGraph], target,
                    default: float = 4.0) -> List[MolGraph]:
    """label ← affinity when the class matches `target`, else `default`
    (the reference's constant 4 for non-target molecules)."""
    for g in graphs:
        g.label = float(g.affinity) if g.label == target else float(default)
    return graphs
