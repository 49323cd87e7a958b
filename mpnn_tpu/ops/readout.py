"""Readout functions R({h_v}) → graph vector.

  * graph_level_output — gated masked sum (Gilmer i/j gating).
    Reference: mpnn_functions/readout/graph_level_output.py:9-47. Parity
    quirk kept: with a mask, the gate is softmax over the FEATURE axis of
    i(x·mask) (not the sigmoid of the original paper — the sigmoid line is
    commented out in the reference, :35-38).

  * set2vec — order-invariant set2set readout (Vinyals et al.), T=100 steps
    of an input-less LSTM + attention read, run as one lax.scan.
    Reference: mpnn_functions/readout/set2vec.py:13-151. Parity quirk kept:
    the attention softmax normalizes over dim 0 of the flattened (B·N, 1)
    energy vector — i.e. across the WHOLE BATCH jointly, not per graph
    (set2vec.py:139). `batch_softmax=False` gives the sane per-graph version.
"""

from __future__ import annotations

import math


import jax
import jax.numpy as jnp

from mpnn_tpu.ops.linear import linear_init, linear_apply

_BIG_NEGATIVE = -1e8


# ---------------------------------------------------------------------------
# GraphLevelOutput
# ---------------------------------------------------------------------------

def graph_level_output_init(key, node_features: int, output_dim: int,
                            dtype=jnp.float32, init: str = "torch_default"):
    """i, j: Linear(2·nf → out). (`node_features` here is already the halved
    size; the reference doubles it internally because the input is
    cat([h_T, h_0]).)"""
    k1, k2 = jax.random.split(key)
    return {
        "i": linear_init(k1, 2 * node_features, output_dim, dtype=dtype,
                         init=init),
        "j": linear_init(k2, 2 * node_features, output_dim, dtype=dtype,
                         init=init),
    }


def graph_level_output_apply(params, input_set, mask=None):
    """input_set: (B, N, 2·nf); mask: (B, N, 1) or None. Returns (B, out)."""
    if mask is not None:
        x = input_set * mask
        gated = jax.nn.softmax(linear_apply(params["i"], x), axis=-1) \
            * linear_apply(params["j"], x) * mask
    else:
        # unmasked branch: softmax over features of the node-summed i
        gate = jax.nn.softmax(
            linear_apply(params["i"], input_set).sum(axis=1), axis=-1)
        gated = gate[:, None, :] * linear_apply(params["j"], input_set)
    return gated.sum(axis=1)


# ---------------------------------------------------------------------------
# Set2Vec
# ---------------------------------------------------------------------------

def _lstm_hidden_init(key, hidden_dim: int, cell_dim: int, dtype=jnp.float32):
    """Input-less LSTM cell: four (hd, cd) weights + (1, cd) biases, all
    U(-1/sqrt(hd), 1/sqrt(hd)) including biases (set2vec.py:64-67)."""
    stdv = 1.0 / math.sqrt(hidden_dim)
    keys = jax.random.split(key, 8)
    def u(k, shape):
        return jax.random.uniform(k, shape, dtype, -stdv, stdv)
    return {
        "w_hi": u(keys[0], (hidden_dim, cell_dim)),
        "b_hi": u(keys[1], (1, cell_dim)),
        "w_hf": u(keys[2], (hidden_dim, cell_dim)),
        "b_hf": u(keys[3], (1, cell_dim)),
        "w_hg": u(keys[4], (hidden_dim, cell_dim)),
        "b_hg": u(keys[5], (1, cell_dim)),
        "w_ho": u(keys[6], (hidden_dim, cell_dim)),
        "b_ho": u(keys[7], (1, cell_dim)),
    }


def _lstm_hidden_apply(p, hprev, cprev):
    i = jax.nn.sigmoid(hprev @ p["w_hi"] + p["b_hi"])
    f = jax.nn.sigmoid(hprev @ p["w_hf"] + p["b_hf"])
    g = jnp.tanh(hprev @ p["w_hg"] + p["b_hg"])
    o = jax.nn.sigmoid(hprev @ p["w_ho"] + p["b_ho"])
    c = f * cprev + i * g
    h = o * jnp.tanh(c)
    return h, c


def set2vec_init(key, node_features: int, time_steps: int = 100,
                 inner_prod: str = "default", dtype=jnp.float32):
    """nf here matches the reference constructor arg; internal width is 2·nf
    because the input set is cat([h_T, h_0])."""
    width = 2 * node_features
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "q_attn": linear_init(k1, width, width, bias=False, dtype=dtype),
        "lstm": _lstm_hidden_init(k3, 2 * width, width, dtype),
    }
    if inner_prod == "default":
        params["e_attn"] = linear_init(k2, width, 1, bias=False, dtype=dtype)
    elif inner_prod != "dot":
        raise ValueError(f"Invalid inner_prod type: {inner_prod}")
    return params


def set2vec_apply(params, input_set, mask=None, *, time_steps: int = 100,
                  inner_prod: str = "default", batch_softmax: bool = True):
    """input_set: (B, N, width) with width = 2·nf. Returns (B, 2·width)
    (the final m = [lstm_h ‖ attention_read]).

    batch_softmax=True reproduces the reference's softmax over the flattened
    (B·N,) energies (set2vec.py:139); False normalizes per graph."""
    B, N, width = input_set.shape
    dtype = input_set.dtype
    mprev = jnp.zeros((B, 2 * width), dtype)
    cprev = jnp.zeros((B, width), dtype)

    add_mask = None
    if mask is not None:
        add_mask = (1.0 - mask.reshape(B, N)) * _BIG_NEGATIVE

    def step(carry, _):
        mprev, cprev = carry
        m, c = _lstm_hidden_apply(params["lstm"], mprev, cprev)
        query = linear_apply(params["q_attn"], m)            # (B, width)
        if inner_prod == "default":
            energies = linear_apply(
                params["e_attn"],
                jnp.tanh(query[:, None, :] + input_set)).reshape(B, N)
        else:  # dot
            energies = jnp.einsum("bnw,bw->bn", input_set, query)
        if add_mask is not None:
            energies = energies + add_mask
        if batch_softmax:
            att = jax.nn.softmax(energies.reshape(-1)).reshape(B, N, 1)
        else:
            att = jax.nn.softmax(energies, axis=-1)[..., None]
        read = (att * input_set).sum(axis=1)                 # (B, width)
        m_out = jnp.concatenate([m, read], axis=1)           # (B, 2·width)
        return (m_out, c), None

    (m_final, _), _ = jax.lax.scan(step, (mprev, cprev), None,
                                   length=time_steps)
    return m_final
