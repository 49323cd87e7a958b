"""Pallas kernel tests (interpret mode on CPU; compiled path exercised on
TPU by bench.py/scripts)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpnn_tpu import ops
from mpnn_tpu.kernels.edge_mlp import (
    edge_mlp_forward, make_edge_mlp_op,
)
from mpnn_tpu.ops.message import _edge_mlp_penultimate

EF, NF, MF, TAIL, E = 8, 23, 23, 5, 300


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    params = ops.edge_network_init(key, NF, EF, MF, tail_repeats=TAIL)
    e = jax.random.normal(jax.random.PRNGKey(1), (E, EF))
    head_ws = tuple(l["w"] for l in params["head"])
    head_bs = tuple(l["b"] for l in params["head"])
    shared = params["shared"]["w"]
    ref = _edge_mlp_penultimate(params, e, jax.nn.relu, TAIL)
    return e, head_ws, head_bs, shared, ref


def test_forward_matches_reference(setup):
    e, head_ws, head_bs, shared, ref = setup
    pen = edge_mlp_forward(e, head_ws, head_bs, shared, tail=TAIL,
                           block=128, interpret=True)
    np.testing.assert_allclose(np.asarray(pen), np.asarray(ref), atol=2e-4)


def test_forward_odd_sizes(setup):
    e, head_ws, head_bs, shared, ref = setup
    # E not a multiple of the block
    pen = edge_mlp_forward(e[:77], head_ws, head_bs, shared, tail=TAIL,
                           block=64, interpret=True)
    np.testing.assert_allclose(np.asarray(pen), np.asarray(ref[:77]),
                               atol=2e-4)


def test_custom_vjp_matches_autodiff(setup):
    e, head_ws, head_bs, shared, ref = setup
    op = make_edge_mlp_op(TAIL, block=128, interpret=True)

    def loss_kernel(e, hw, hb, sw):
        return (op(e, hw, hb, sw) ** 2).sum()

    def loss_ref(e, hw, hb, sw):
        params = {"head": [{"w": w, "b": b} for w, b in zip(hw, hb)],
                  "shared": {"w": sw}}
        return (_edge_mlp_penultimate(params, e, jax.nn.relu, TAIL) ** 2).sum()

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(
        e, head_ws, head_bs, shared)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(
        e, head_ws, head_bs, shared)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_zero_tail(setup):
    e, head_ws, head_bs, shared, _ = setup
    pen = edge_mlp_forward(e, head_ws, head_bs, shared, tail=0,
                           block=128, interpret=True)
    params = {"head": [{"w": w, "b": b} for w, b in zip(head_ws, head_bs)],
              "shared": {"w": shared}}
    ref = _edge_mlp_penultimate(params, e, jax.nn.relu, 0)
    np.testing.assert_allclose(np.asarray(pen), np.asarray(ref), atol=2e-4)
