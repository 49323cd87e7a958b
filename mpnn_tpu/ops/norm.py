"""Masked batch normalization.

Two variants, matching models/mask_batch_norm.py:

  * mask_batch_norm        — stateless, no affine, no running stats (:5-15).
    Quirk kept for parity: the mean is `tensor.sum / mask.sum` — the numerator
    sums ALL rows including padding (correct only because padded rows are
    zero), while variance and output are explicitly masked.

  * MaskBatchNorm1dState   — affine + running stats (:18-38). Train mode
    normalizes with masked batch stats (by sqrt(var)+eps) and EMAs the
    running stats; eval mode normalizes with running stats (by
    running_var**0.5 + eps). Both epsilon placements are OUTSIDE the sqrt —
    a reference quirk reproduced exactly.

Cross-replica: under data parallelism the batch stats must be identical to
the single-chip run, so (Σx, Σx², Σmask) are psum'd over the mesh axis when
`axis_name` is given (the TPU-native equivalent of sync batch norm — the
reference has no distributed story at all, SURVEY.md §2.6).

State is explicit: a dict {mean, var, momentum-free} threaded functionally.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def mask_batch_norm(tensor, mask, eps: float = 1e-6,
                    axis_name: Optional[str] = None):
    """Stateless masked BN over flattened rows.

    tensor: (..., f) — flattened to (R, f); mask broadcastable to (R, 1)."""
    orig_shape = tensor.shape
    f = orig_shape[-1]
    x = tensor.reshape(-1, f)
    m = mask.reshape(-1, 1).astype(x.dtype)
    total = x.sum(axis=0)
    count = m.sum()
    if axis_name is not None:
        total = jax.lax.psum(total, axis_name)
        count = jax.lax.psum(count, axis_name)
    mean = total / count
    sq = (((x - mean) * m) ** 2).sum(axis=0)
    if axis_name is not None:
        sq = jax.lax.psum(sq, axis_name)
    var = sq / count
    return (((x - mean) * m) / jnp.sqrt(var + eps)).reshape(orig_shape)


def bn1d_init(num_features: int, dtype=jnp.float32):
    """Affine params + running-stat state (torch BatchNorm1d defaults:
    weight=1, bias=0, running_mean=0, running_var=1, momentum=0.1, eps=1e-5).
    """
    params = {
        "weight": jnp.ones((num_features,), dtype),
        "bias": jnp.zeros((num_features,), dtype),
    }
    state = {
        "running_mean": jnp.zeros((num_features,), dtype),
        "running_var": jnp.ones((num_features,), dtype),
    }
    return params, state


def bn1d_apply(params, state, tensor, mask, *, training: bool,
               momentum: float = 0.1, eps: float = 1e-5,
               axis_name: Optional[str] = None):
    """Masked BatchNorm1d. Returns (out, new_state).

    Matches MaskBatchNorm1d exactly, including:
      - masked mean uses (y*mask).sum / mask.sum (unlike the stateless one),
      - train normalizes by (sqrt(var) + eps), eval by (running_var**0.5 + eps),
      - output re-masked, affine applied before the final mask."""
    orig_shape = tensor.shape
    f = orig_shape[-1]
    y = tensor.reshape(-1, f)
    m = mask.reshape(-1, 1).astype(y.dtype)

    total = (y * m).sum(axis=0)
    count = m.sum()
    if axis_name is not None:
        total = jax.lax.psum(total, axis_name)
        count = jax.lax.psum(count, axis_name)
    mean = total / count
    sq = (((y - mean) * m) ** 2).sum(axis=0)
    if axis_name is not None:
        sq = jax.lax.psum(sq, axis_name)
    var = sq / count

    if training:
        new_state = {
            "running_mean": (1 - momentum) * state["running_mean"] + momentum * mean,
            "running_var": (1 - momentum) * state["running_var"] + momentum * var,
        }
        # clamp inside the sqrt: at var == 0 the forward is unchanged
        # ((y-mean) == 0 / eps) but sqrt's gradient would be inf — zero-
        # variance features (constant bond types in a small batch) would NaN
        # the backward pass
        out = (y - mean) / (jnp.sqrt(jnp.maximum(var, 1e-12)) + eps)
    else:
        new_state = state
        out = (y - state["running_mean"]) / (state["running_var"] ** 0.5 + eps)

    out = params["weight"] * out + params["bias"]
    return (out * m).reshape(orig_shape), new_state
