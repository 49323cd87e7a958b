"""Feature-compression autoencoders and embedding encoders.

The reference pretrains small autoencoders offline and injects their frozen
encoder halves into models (SURVEY.md §2.3 encoders table):

  * atom_autoencoder  — 30→15→8 tanh encoder; BN+15→30 sigmoid decoder
                        (mpnn_functions/encoders/atom_autoencoder.py:4-21)
  * bond_autoencoder  — 8→4→2 tanh encoder; BN+4→8 sigmoid decoder
                        (mpnn_functions/encoders/bond_autoencoder.py:4-21)
  * generic_autoencoder — in→mid→e sigmoid MLP both ways
                        (mpnn_functions/encoders/auto_encoder.py:3-24)
  * parametric_autoencoder — in→⌈in/2⌉→⌈in/2⌉//2
                        (mpnn_functions/encoders/c_autoencoder.py:5-25)
  * embedding encoders — nn.Embedding(58,4)/(8,2) lookup tables keyed by
                        distinct observed atom/bond feature vectors
                        (test_embed.py:23-46)

All are expressed as init/apply pure functions; BN inside decoders is the
standard (unmasked) batch norm over rows with running stats.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from mpnn_tpu.ops.linear import linear_init, linear_apply
from mpnn_tpu.ops.norm import bn1d_init


def _bn_rows_apply(params, state, x, *, training: bool,
                   momentum: float = 0.1, eps: float = 1e-5):
    """Plain (unmasked) BatchNorm1d over rows — used inside AE decoders.
    Standard torch semantics: normalize by sqrt(var+eps); running_var uses the
    unbiased estimator."""
    if training:
        mean = x.mean(axis=0)
        var = x.var(axis=0)
        n = x.shape[0]
        unbiased = var * n / max(n - 1, 1)
        new_state = {
            "running_mean": (1 - momentum) * state["running_mean"] + momentum * mean,
            "running_var": (1 - momentum) * state["running_var"] + momentum * unbiased,
        }
        out = (x - mean) / jnp.sqrt(var + eps)
    else:
        new_state = state
        out = (x - state["running_mean"]) / jnp.sqrt(state["running_var"] + eps)
    return params["weight"] * out + params["bias"], new_state


def _mlp_init(key, dims, biases, dtype):
    keys = jax.random.split(key, len(dims))
    return [linear_init(k, din, dout, bias=b, dtype=dtype)
            for k, (din, dout), b in zip(keys, dims, biases)]


# -- tanh-style AE (atom 30→15→8, bond 8→4→2, parametric) --------------------

def tanh_autoencoder_init(key, in_dim: int, mid_dim: int, e_dim: int,
                          dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    enc = _mlp_init(k1, [(in_dim, mid_dim), (mid_dim, e_dim)],
                    [False, True], dtype)
    dec = _mlp_init(k2, [(e_dim, mid_dim), (mid_dim, in_dim)],
                    [True, True], dtype)
    bn_p, bn_s = bn1d_init(e_dim, dtype)
    return {"enc": enc, "dec": dec, "bn": bn_p}, {"bn": bn_s}


def atom_autoencoder_init(key, dtype=jnp.float32):
    return tanh_autoencoder_init(key, 30, 15, 8, dtype)


def bond_autoencoder_init(key, dtype=jnp.float32):
    return tanh_autoencoder_init(key, 8, 4, 2, dtype)


def parametric_autoencoder_init(key, in_features: int, dtype=jnp.float32):
    mid = int(math.ceil(in_features / 2.0))
    return tanh_autoencoder_init(key, in_features, mid, mid // 2, dtype)


def tanh_encoder_apply(params, x):
    """Encoder half (the part injected frozen into models):
    Linear(no bias) → tanh → Linear."""
    h = jnp.tanh(linear_apply(params["enc"][0], x))
    return linear_apply(params["enc"][1], h)


def tanh_autoencoder_apply(params, state, x, *, training: bool):
    """Full AE forward (for pretraining): encode → BN → dec → sigmoid."""
    z = tanh_encoder_apply(params, x)
    flat = z.reshape(-1, z.shape[-1])
    normed, bn_s = _bn_rows_apply(params["bn"], state["bn"], flat,
                                  training=training)
    h = jnp.tanh(linear_apply(params["dec"][0],
                              normed.reshape(z.shape)))
    out = jax.nn.sigmoid(linear_apply(params["dec"][1], h))
    return out, {"bn": bn_s}


# -- sigmoid-style generic AE ------------------------------------------------

def generic_autoencoder_init(key, in_dim: int = 784, mid_dim: int = 400,
                             e_dim: int = 20, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    enc = _mlp_init(k1, [(in_dim, mid_dim), (mid_dim, e_dim)],
                    [False, False], dtype)
    dec = _mlp_init(k2, [(e_dim, mid_dim), (mid_dim, in_dim)],
                    [False, False], dtype)
    return {"enc": enc, "dec": dec}


def generic_encoder_apply(params, x):
    h = jax.nn.sigmoid(linear_apply(params["enc"][0], x))
    return jax.nn.sigmoid(linear_apply(params["enc"][1], h))


def generic_autoencoder_apply(params, x):
    z = generic_encoder_apply(params, x)
    h = jax.nn.sigmoid(linear_apply(params["dec"][0], z))
    return jax.nn.sigmoid(linear_apply(params["dec"][1], h))


# -- embedding encoders (lookup-table AEs) -----------------------------------

def embedding_encoder_init(key, vocab: int, dim: int, dtype=jnp.float32):
    """nn.Embedding(vocab, dim, max_norm=1) + BN+Linear decoder back to a
    vocab-sized one-hot logit. Embedding init: N(0,1); max_norm renorm is
    applied at lookup time."""
    k1, k2 = jax.random.split(key)
    table = jax.random.normal(k1, (vocab, dim), dtype)
    dec = linear_init(k2, dim, vocab, dtype=dtype)
    bn_p, bn_s = bn1d_init(dim, dtype)
    return {"table": table, "dec": dec, "bn": bn_p}, {"bn": bn_s}


def embedding_lookup(params, ids, max_norm: float = 1.0):
    table = params["table"]
    if max_norm is not None:
        norms = jnp.linalg.norm(table, axis=-1, keepdims=True)
        table = table * jnp.minimum(1.0, max_norm / jnp.maximum(norms, 1e-12))
    return table[ids]


def embedding_encoder_apply(params, state, ids, *, training: bool):
    z = embedding_lookup(params, ids)
    flat = z.reshape(-1, z.shape[-1])
    normed, bn_s = _bn_rows_apply(params["bn"], state["bn"], flat,
                                  training=training)
    logits = linear_apply(params["dec"], normed.reshape(z.shape))
    return logits, {"bn": bn_s}
