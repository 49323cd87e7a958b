"""Minimal functional linear-layer helpers shared by all ops.

Params are plain dicts of jnp arrays; weights are stored (in, out) so the
forward op is `x @ W + b` (MXU-friendly trailing contraction).
"""

from __future__ import annotations

import jax.numpy as jnp
import jax

from mpnn_tpu.utils.initializers import (
    kaiming_uniform,
    torch_linear_default,
    uniform_bound,
)


def linear_init(key, in_dim: int, out_dim: int, bias: bool = True,
                init: str = "torch_default", dtype=jnp.float32):
    """init: 'torch_default' | 'kaiming_relu' | 'zeros'."""
    wkey, bkey = jax.random.split(key)
    if init == "kaiming_relu":
        w = kaiming_uniform(wkey, in_dim, (in_dim, out_dim), dtype)
        b = jnp.zeros((out_dim,), dtype) if bias else None
    elif init == "zeros":
        w = jnp.zeros((in_dim, out_dim), dtype)
        b = jnp.zeros((out_dim,), dtype) if bias else None
    else:  # torch Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for w AND b
        w = torch_linear_default(wkey, in_dim, (in_dim, out_dim), dtype)
        b = uniform_bound(bkey, (out_dim,), float(in_dim) ** -0.5, dtype) if bias else None
    p = {"w": w}
    if bias:
        p["b"] = b
    return p


def linear_apply(params, x):
    y = x @ params["w"]
    if "b" in params:
        y = y + params["b"]
    return y
