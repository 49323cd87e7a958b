"""Full network = input wrapper → MPNN → (BN) → dense head.

Mirrors the reference driver composition
`nn.Sequential(GraphWrapper(mpnn), [BatchNorm1d,] head)` (test_lipo.py:124-129,
test.py:85-90) as one init/apply pair.

Input wrappers (SURVEY.md §2.4 wrappers table):
  * 'plain'      — batch dict → (afm, bfm, adj, mask)    (graph_model_wrapper.py)
  * 'graph_norm' — batch-norm nafm (bn1d, masked) and concat onto afm
                   (graph_norm_wrapper.py:13, the Lipo pipeline)
  * 'batch_norm' — stateless-masked-BN afm and bfm (bfm zeroed off-adjacency)
                   (batch_norm_graph_wrapper.py:12-17)

Heads:
  * 'linear'     — single Linear(out → classes)          (test.py:89)
  * 'halving'    — widths halved (ceil) until ≤10, ReLU between, final
                   Linear(→1)                            (test_lipo.py:104-110)
  * 'mlp'        — explicit width list                   (test_single_target.py:85-97)
  * 'none'
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from mpnn_tpu.models.config import MPNNConfig
from mpnn_tpu.models.mpnn import mpnn_init, mpnn_apply
from mpnn_tpu.ops import bn1d_init, bn1d_apply, mask_batch_norm
from mpnn_tpu.ops.linear import linear_init, linear_apply
from mpnn_tpu.ops.autoencoders import _bn_rows_apply


@dataclasses.dataclass(frozen=True)
class NetworkConfig:
    mpnn: MPNNConfig
    input_wrapper: str = "plain"        # plain|graph_norm|batch_norm
    nafm_features: int = 0              # needed for graph_norm wrapper
    head: str = "linear"                # linear|halving|mlp|none
    head_dims: Tuple[int, ...] = ()     # for 'mlp': hidden+output widths
    head_output: int = 1                # final width for linear/halving
    head_bn: bool = False               # nn.BatchNorm1d on graph embeddings
    kaiming_head: bool = True           # drivers apply init_weights (kaiming)


def halving_dims(start: int, floor: int = 10) -> Sequence[Tuple[int, int]]:
    """test_lipo.py:104-110: halve (ceil) until ≤ floor, then Linear(→1)."""
    dims = []
    den = start
    while den > floor:
        new_den = int(math.ceil(den / 2))
        dims.append((den, new_den))
        den = new_den
    return dims


def network_init(key, cfg: NetworkConfig, dtype=jnp.float32):
    k_mpnn, k_wrap, k_head, k_bn = jax.random.split(key, 4)
    params, state = {}, {}
    params["mpnn"], state["mpnn"] = mpnn_init(k_mpnn, cfg.mpnn, dtype)

    if cfg.input_wrapper == "graph_norm":
        p, s = bn1d_init(cfg.nafm_features, dtype)
        params["nafm_bn"], state["nafm_bn"] = p, s

    emb = cfg.mpnn.effective_output_dim
    if cfg.head_bn:
        p, s = bn1d_init(emb, dtype)
        params["head_bn"], state["head_bn"] = p, s

    init = "kaiming_relu" if cfg.kaiming_head else "torch_default"
    if cfg.head == "linear":
        params["head"] = [linear_init(k_head, emb, cfg.head_output,
                                      init=init, dtype=dtype)]
    elif cfg.head == "halving":
        widths = halving_dims(emb)
        last = widths[-1][1] if widths else emb
        keys = jax.random.split(k_head, len(widths) + 1)
        params["head"] = [linear_init(k, din, dout, init=init, dtype=dtype)
                          for k, (din, dout) in zip(keys, widths)]
        params["head"].append(linear_init(keys[-1], last, cfg.head_output,
                                          init=init, dtype=dtype))
    elif cfg.head == "mlp":
        widths = [emb] + list(cfg.head_dims)
        keys = jax.random.split(k_head, len(cfg.head_dims))
        params["head"] = [linear_init(k, din, dout, init=init, dtype=dtype)
                          for k, din, dout in
                          zip(keys, widths[:-1], widths[1:])]
    elif cfg.head != "none":
        raise ValueError(cfg.head)
    return params, state


def network_apply(params, state, cfg: NetworkConfig, batch, *,
                  training: bool, axis_name: Optional[str] = None):
    """batch: dict with afm, bfm, adj, mask (+ nafm for graph_norm).
    Returns (output (B, classes), new_state)."""
    new_state = dict(state)
    afm, bfm = batch["afm"], batch["bfm"]
    adj, mask = batch["adj"], batch["mask"]

    if cfg.input_wrapper == "graph_norm":
        nafm, new_state["nafm_bn"] = bn1d_apply(
            params["nafm_bn"], state["nafm_bn"], batch["nafm"], mask,
            training=training, axis_name=axis_name)
        afm = jnp.concatenate([afm, nafm], axis=-1)
    elif cfg.input_wrapper == "batch_norm":
        afm = mask_batch_norm(afm, mask, axis_name=axis_name)
        bfm = mask_batch_norm(bfm * adj[..., None], adj, axis_name=axis_name)

    out, new_state["mpnn"] = mpnn_apply(
        params["mpnn"], state["mpnn"], cfg.mpnn, afm, bfm, adj, mask,
        training=training, axis_name=axis_name)

    if cfg.head_bn:
        # torch nn.BatchNorm1d over the (B, emb) graph embeddings
        flat, new_state["head_bn"] = _bn_rows_apply(
            params["head_bn"], state["head_bn"], out, training=training)
        out = flat

    if cfg.head != "none":
        layers = params["head"]
        for layer in layers[:-1]:
            out = jax.nn.relu(linear_apply(layer, out))
        out = linear_apply(layers[-1], out)
    return out, new_state


def network_apply_packed(params, state, cfg: NetworkConfig, batch, *,
                         training: bool, axis_name: Optional[str] = None,
                         spmm_fn=None, spmm_vocab_fn=None, sddmm_fn=None,
                         recurrence_fn=None, fused_op=None, eval_op=None):
    """Packed-batch network forward: same params as network_init; the MPNN
    runs on the sparse path (models/sparse.py) — or, when `fused_op` is
    given (training only; whole-step kernel from
    fused_train.make_fused_step_for_batch), as ONE forward pallas_call via
    fused_mpnn_out, with the wrapper/head/loss staying in XLA around it.
    `eval_op` (inference only; fused_train.make_fused_eval_for_batch) runs
    the MPNN core through the whole-step INFERENCE kernel — the serving
    path — with running-stat BN folded to affines; state passes through
    unchanged. batch: PackedBatch dict. Returns (out (num_graphs, classes),
    new_state)."""
    from mpnn_tpu.models.sparse import sparse_mpnn_apply

    new_state = dict(state)
    node_feats = batch["node_feats"]
    mask = batch["node_mask"]

    if cfg.input_wrapper == "graph_norm":
        nafm, new_state["nafm_bn"] = bn1d_apply(
            params["nafm_bn"], state["nafm_bn"], batch["node_nafm"], mask,
            training=training, axis_name=axis_name)
        node_feats = jnp.concatenate([node_feats, nafm], axis=-1)
    elif cfg.input_wrapper == "batch_norm":
        node_feats = mask_batch_norm(node_feats, mask, axis_name=axis_name)
        batch = dict(batch)
        batch["edge_feats"] = mask_batch_norm(
            batch["edge_feats"], batch["edge_mask"][:, None],
            axis_name=axis_name)

    mb = dict(batch)
    mb["node_feats"] = node_feats
    if eval_op is not None and not training and axis_name is None:
        from mpnn_tpu.models.fused_train import fused_mpnn_eval
        out = fused_mpnn_eval(
            params["mpnn"], state["mpnn"], cfg.mpnn, mb, eval_op)
        new_state["mpnn"] = state["mpnn"]
    elif fused_op is not None and training and axis_name is None:
        from mpnn_tpu.models.fused_train import fused_mpnn_out
        out, new_state["mpnn"] = fused_mpnn_out(
            params["mpnn"], state["mpnn"], cfg.mpnn, mb, fused_op)
    else:
        out, new_state["mpnn"] = sparse_mpnn_apply(
            params["mpnn"], state["mpnn"], cfg.mpnn, mb,
            training=training, axis_name=axis_name, spmm_fn=spmm_fn,
            spmm_vocab_fn=spmm_vocab_fn, sddmm_fn=sddmm_fn,
            recurrence_fn=recurrence_fn)

    if cfg.head_bn:
        # same torch-BatchNorm1d semantics as the dense path; assumes no
        # padded graph slots (collate_packed defaults to exact graph count —
        # padded slots would shift the statistics)
        out, new_state["head_bn"] = _bn_rows_apply(
            params["head_bn"], state["head_bn"], out, training=training)

    if cfg.head != "none":
        layers = params["head"]
        for layer in layers[:-1]:
            out = jax.nn.relu(linear_apply(layer, out))
        out = linear_apply(layers[-1], out)
    return out, new_state
