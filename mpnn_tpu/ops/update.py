"""Masked GRU node update.

Reference semantics (mpnn_functions/update/gru_update.py:5-69):
  - explicit r/z/n gates from two weight matmuls (no fused torch GRUCell),
  - each gate is multiplied by the node mask BEFORE the state blend,
  - h' = (1-z)·n + z·h, and the output is re-masked by the caller.

The reference's constructor arg-swap means its weight shapes are only
coherent when message_features == node_features (SURVEY.md §2.3); we assert
that and use a single feature size. Init: xavier-uniform (sigmoid gain) for
weights, zeros for biases (gru_update.py:17-24). Note the reference keeps
separate bias_ih/bias_hh that are always summed; we keep both for
state-dict-shaped parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mpnn_tpu.utils.initializers import xavier_uniform_sigmoid


def gru_init(key, nf: int, mf: int, dtype=jnp.float32):
    assert nf == mf, (
        "reference GRU weight shapes are only coherent when "
        f"message_features == node_features (got nf={nf}, mf={mf})")
    k1, k2 = jax.random.split(key)
    # stored (in, 3*out) so the forward is x @ W
    w_ih = xavier_uniform_sigmoid(k1, mf, 3 * nf, (mf, 3 * nf), dtype)
    w_hh = xavier_uniform_sigmoid(k2, nf, 3 * nf, (nf, 3 * nf), dtype)
    return {
        "w_ih": w_ih,
        "w_hh": w_hh,
        "b_ih": jnp.zeros((3 * nf,), dtype),
        "b_hh": jnp.zeros((3 * nf,), dtype),
    }


def gru_apply(params, messages, node_states, mask):
    """messages, node_states: (B,N,f); mask: (B,N,1) with 1=real atom.
    Returns masked updated states (B,N,f)."""
    nf = node_states.shape[-1]
    rzn_i = messages @ params["w_ih"] + params["b_ih"]
    rzn_h = node_states @ params["w_hh"] + params["b_hh"]
    ri, zi, ni = jnp.split(rzn_i, 3, axis=-1)
    rh, zh, nh = jnp.split(rzn_h, 3, axis=-1)
    r = jax.nn.sigmoid(ri + rh) * mask
    z = jax.nn.sigmoid(zi + zh) * mask
    n = jnp.tanh(ni + r * nh) * mask
    h_prime = (1.0 - z) * n + z * node_states
    return h_prime * mask
