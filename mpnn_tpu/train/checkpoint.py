"""Checkpoint save/RESUME — pickle-free.

The reference only saves (torch.save state_dict + pickled attrs, gated on
val F1 — test.py:28-34,137-138); resume is absent. Here both are first-class
(SURVEY.md §5): a checkpoint is an .npz of pytree leaves keyed by their tree
paths + a JSON sidecar (step, epoch, rng, scheduler state, metadata), so a
run restarts exactly where it stopped.
"""

from __future__ import annotations

import json
import os
import re

from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _path_key(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


def tree_to_arrays(tree) -> Dict[str, np.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in flat:
        key = _path_key(path)
        assert key not in out, f"duplicate path {key}"
        out[key] = np.asarray(leaf)
    return out


def arrays_into_tree(tree, arrays: Dict[str, np.ndarray]):
    """Replace each leaf of `tree` (the template, e.g. freshly-initialized
    params) with the saved array at the same path."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    leaves = []
    for path, leaf in flat:
        key = _path_key(path)
        if key not in arrays:
            raise KeyError(f"checkpoint missing leaf {key}")
        arr = arrays[key]
        if np.shape(arr) != np.shape(leaf):
            raise ValueError(
                f"shape mismatch at {key}: checkpoint {np.shape(arr)} vs "
                f"model {np.shape(leaf)}")
        leaves.append(arr.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(path: str, *, params, state=None, opt_state=None,
                    meta: Optional[dict] = None):
    arrays = {}
    for name, tree in (("params", params), ("state", state),
                       ("opt_state", opt_state)):
        if tree is not None:
            for k, v in tree_to_arrays(tree).items():
                arrays[f"{name}/{k}"] = v
    tmp = path + ".tmp.npz"     # np.savez appends .npz to extension-less names
    np.savez(tmp, **arrays)
    os.replace(tmp, path)
    with open(path + ".meta.json", "w") as f:
        json.dump(meta or {}, f)


def load_checkpoint(path: str, *, params, state=None, opt_state=None
                    ) -> Tuple[Any, Any, Any, dict]:
    """Templates in, restored trees out."""
    with np.load(path) as f:
        arrays = {k: f[k] for k in f.files}

    def pick(prefix):
        plen = len(prefix) + 1
        return {k[plen:]: v for k, v in arrays.items()
                if k.startswith(prefix + "/")}

    params = arrays_into_tree(params, pick("params"))
    if state is not None:
        state = arrays_into_tree(state, pick("state"))
    if opt_state is not None:
        opt_state = arrays_into_tree(opt_state, pick("opt_state"))
    meta = {}
    if os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            meta = json.load(f)
    return params, state, opt_state, meta


def latest_checkpoint(ckpt_dir: str, prefix: str = "ckpt") -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    best, best_step = None, -1
    pat = re.compile(rf"^{re.escape(prefix)}_(\d+)\.npz$")
    for name in os.listdir(ckpt_dir):
        m = pat.match(name)
        if m and int(m.group(1)) > best_step:
            best_step = int(m.group(1))
            best = os.path.join(ckpt_dir, name)
    return best
