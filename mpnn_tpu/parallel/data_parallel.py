"""Distributed training over a device mesh — the scaling-book recipe:
annotate shardings, keep the math identical, let XLA insert collectives.

Two composable axes (SURVEY.md §2.6):

  * DATA parallelism (dense or packed batches): params/opt-state replicated,
    batch sharded over 'data'; the SAME train step as single-chip. Global
    reductions (loss mean, gradient sums, masked-BN statistics) become psums
    over ICI automatically, so the distributed run is numerically IDENTICAL
    to single-chip — verified in tests/test_parallel.py.

  * EDGE partitioning (packed path): the flat edge axis is sharded over
    'edge' — XLA partitions the gather/contract and turns the scatter-add
    segment-sum into partial sums + an all-reduce. Alternatively the
    explicit shard_map SpMM (edge_partition.py) slots in via the `spmm_fn`
    hook; shard_map has native AD so gradients through it are exact.
"""

from __future__ import annotations

from functools import partial


import jax

import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mpnn_tpu.models.config import MPNNConfig
from mpnn_tpu.models.network import NetworkConfig
from mpnn_tpu.models.sparse import sparse_mpnn_apply
from mpnn_tpu.train.trainer import make_loss_fn


def make_dp_train_step(net_cfg: NetworkConfig, tx, loss_kind: str,
                       mesh: Mesh):
    """Dense-path DP step. Feed batches placed with put_dp_batch."""
    loss_fn = make_loss_fn(net_cfg, loss_kind)
    repl = NamedSharding(mesh, P())

    @partial(jax.jit, out_shardings=(repl, repl, repl, repl))
    def step(params, state, opt_state, batch):
        (loss, (out, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, state, batch, True)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return loss, params, new_state, opt_state

    return step


def put_dp_batch(mesh: Mesh, batch: dict) -> dict:
    """Shard every batch array's leading (graph) axis over 'data'."""
    sh = NamedSharding(mesh, P("data"))
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def put_replicated(mesh: Mesh, tree):
    return jax.device_put(tree, NamedSharding(mesh, P()))


# ---------------------------------------------------------------------------
# packed path: edge-sharded step (jit auto-SPMD or explicit shard_map SpMM)
# ---------------------------------------------------------------------------

_EDGE_KEYS = ("edge_src", "edge_dst", "edge_feats", "edge_mask",
              "edge_vid", "edge_types")


def put_packed_batch(mesh: Mesh, batch: dict) -> dict:
    """Edge arrays sharded over 'edge'; node/graph arrays replicated (the
    graph compiler packs the whole global batch into one flat node axis)."""
    esh = NamedSharding(mesh, P("edge"))
    repl = NamedSharding(mesh, P())
    out = {}
    for k, v in batch.items():
        if not hasattr(v, "shape"):
            out[k] = v
        elif k in _EDGE_KEYS:
            out[k] = jax.device_put(v, esh)
        else:
            out[k] = jax.device_put(v, repl)
    return out


def make_packed_train_step(cfg: MPNNConfig, tx, mesh: Mesh, *,
                           loss: str = "mse", spmm_fn=None):
    """Packed-path train step for an edge-partitioned batch. With
    spmm_fn=None XLA's SPMD partitioner handles the sharded segment-sum;
    pass make_edge_partitioned_spmm(mesh) for the explicit-collective
    variant (same numbers, hand-placed psum)."""
    repl = NamedSharding(mesh, P())

    def loss_fn(params, state, batch, labels):
        out, new_state = sparse_mpnn_apply(params, state, cfg, batch,
                                           training=True, spmm_fn=spmm_fn)
        gm = batch["graph_mask"][:, None]
        target = labels.astype(out.dtype)
        if target.ndim == out.ndim - 1:
            target = target[..., None]
        if loss == "mse":
            per = ((out - target) ** 2) * gm
            return per.sum() / (gm.sum() * out.shape[-1]), new_state
        raise ValueError(loss)

    @partial(jax.jit, out_shardings=(repl, repl, repl, repl))
    def step(params, state, opt_state, batch):
        batch = dict(batch)
        labels = batch.pop("labels")
        (l, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, state, batch, labels)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return l, params, new_state, opt_state

    return step
