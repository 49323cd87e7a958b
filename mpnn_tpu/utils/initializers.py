"""Weight initializers matching the distributions used by the reference.

The reference initializes weights with torch's kaiming-uniform (relu gain),
xavier-uniform (sigmoid gain), and torch's default Linear init
(kaiming-uniform with a=sqrt(5), which reduces to U(-1/sqrt(fan_in), ...)).
We reproduce the *distribution laws* (bounds as a function of fan-in/out),
not the RNG streams.

Weight layout convention: our linear weights are stored as (in, out) so that
`x @ W` is the forward op (torch stores (out, in)). fan_in/fan_out are
computed accordingly.

Reference semantics: models/lipo_basic_model.py:88-107 (kaiming for Linear,
xavier-sigmoid for GRUCell weights, zero biases),
mpnn_functions/update/gru_update.py:17-24.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def uniform_bound(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def kaiming_uniform(key, fan_in: int, shape, dtype=jnp.float32):
    """torch.nn.init.kaiming_uniform_(nonlinearity='relu'): gain=sqrt(2),
    bound = gain * sqrt(3 / fan_in) = sqrt(6 / fan_in)."""
    bound = math.sqrt(6.0 / fan_in)
    return uniform_bound(key, shape, bound, dtype)


def xavier_uniform_sigmoid(key, fan_in: int, fan_out: int, shape, dtype=jnp.float32):
    """torch.nn.init.xavier_uniform_(gain=calculate_gain('sigmoid')=1.0):
    bound = sqrt(6 / (fan_in + fan_out))."""
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return uniform_bound(key, shape, bound, dtype)


def torch_linear_default(key, fan_in: int, shape, dtype=jnp.float32):
    """torch.nn.Linear default init: kaiming_uniform(a=sqrt(5)) →
    bound = 1/sqrt(fan_in). Used for layers the reference never re-inits."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return uniform_bound(key, shape, bound, dtype)
