"""Sparse (packed COO) MPNN forward — the TPU-native hot path.

Consumes PackedBatch (graphs/batching.py): one flat node axis + one flat
edge axis, both padded to bucketed capacities. Shares PARAMETERS with the
dense model (mpnn_init) — the two paths are numerically equivalent, verified
by tests/test_sparse.py.

Why this is exact (not an approximation) for the EdgeNetwork family:
the dense reference sums messages over ALL N² pairs, so zero-feature
non-edges leak the edge-MLP bias into every message ("bias leakage",
SURVEY.md §2.3). Writing A(e) = W̃(p_e) + Bf with p_e the edge-MLP
penultimate features:

    m_v = Σ_w A(e_vw) h_w
        = Σ_{real edges w→v} (W̃(p_e) − W̃(p_0)) h_w  +  A(0) · Σ_{w∈graph} h_w

The first term is an SpMM over the E real edges (padded edges have
p_e = p_0 so they vanish identically); the second is a per-graph rank-1
correction. Edge-count work replaces N² work with zero semantic drift.

Cost layout (MXU-friendly):
    V[n]    = einsum(Wf[p,m,f], h[n,f])    — node_cap·pf·mf·nf
    msg_e   = Σ_p (p_e − p_0)[p] · V[src_e][p,:]   — E·pf·mf
    agg     = segment_sum(msg_e, dst)               — scatter-add
vs dense    B·N·pf·mf·nf + B·N²·pf·mf. For molecules (E ≈ 2.1·N) the N²
term drops to ~2N — a ~N/2 reduction of the dominant term.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mpnn_tpu.models.config import MPNNConfig
from mpnn_tpu.ops.autoencoders import tanh_encoder_apply
from mpnn_tpu.ops.linear import linear_apply
from mpnn_tpu.ops.message import _edge_mlp_penultimate
from mpnn_tpu.ops.norm import bn1d_apply, mask_batch_norm
from mpnn_tpu.ops.readout import _BIG_NEGATIVE
from mpnn_tpu.ops.update import gru_apply


def _edge_penultimates(mparams, edge_feats, cfg: MPNNConfig):
    """(E, pf) penultimate features and the zero-edge penultimate (1, pf)."""
    act = jax.nn.relu
    pen = _edge_mlp_penultimate(mparams, edge_feats, act,
                                cfg.edge_mlp_tail_repeats)
    zero = jnp.zeros((1, edge_feats.shape[-1]), edge_feats.dtype)
    pen0 = _edge_mlp_penultimate(mparams, zero, act,
                                 cfg.edge_mlp_tail_repeats)
    return pen, pen0


def sparse_edge_network_fused(mparams, pen, pen0, h, edge_src, edge_dst,
                              node_graph, graph_mask, *, nf: int, mf: int,
                              spmm_fn=None):
    """m = SpMM(edges) + A(0)·S_graph + message_bias  (see module docstring).

    h: (node_cap, nf); returns (node_cap, mf). spmm_fn optionally overrides
    the gather–contract–scatter with a Pallas kernel (kernels/spmm.py)."""
    node_cap = h.shape[0]
    pf = pen.shape[-1]
    wf = mparams["final"]["w"].reshape(pf, mf, nf)
    bf = mparams["final"]["b"].reshape(mf, nf)

    ptilde = pen - pen0                                     # (E, pf)
    if spmm_fn is None:
        v = jnp.einsum("pmf,nf->npm", wf, h,
                       preferred_element_type=h.dtype)      # (node_cap,pf,mf)
        edge_msg = jnp.einsum("ep,epm->em", ptilde, v[edge_src],
                              preferred_element_type=h.dtype)
        agg = jax.ops.segment_sum(edge_msg, edge_dst, num_segments=node_cap)
    else:
        agg = spmm_fn(ptilde, h, edge_src, edge_dst, wf)

    # per-graph rank-1 correction: A(0) · Σ_{w∈g} h_w
    num_graphs = graph_mask.shape[0]
    s = jax.ops.segment_sum(h, node_graph, num_segments=num_graphs + 1)
    a0 = jnp.einsum("p,pmf->mf", pen0[0], wf) + bf          # (mf, nf)
    base = s[node_graph] @ a0.T                             # (node_cap, mf)
    return agg + base + mparams["message_bias"]


def sparse_graph_level_output(rparams, x, node_mask, node_graph,
                              num_graphs: int):
    """Packed gated readout: per-node gating then segment-sum per graph
    (graph_level_output.py:36-47 semantics on the flat node axis)."""
    xm = x * node_mask
    gated = jax.nn.softmax(linear_apply(rparams["i"], xm), axis=-1) \
        * linear_apply(rparams["j"], xm) * node_mask
    return jax.ops.segment_sum(gated, node_graph,
                               num_segments=num_graphs + 1)[:-1]


def sparse_mpnn_apply(params, state, cfg: MPNNConfig, batch, *,
                      training: bool, axis_name: Optional[str] = None,
                      spmm_fn=None):
    """Packed-batch MPNN forward; parameters from mpnn_init (shared with the
    dense path). Supports the fused EdgeNetwork family + GRU + masked norms +
    graph_level readout (the flagship/hot configurations; attention and
    set2vec variants run on the dense path).

    batch keys: node_feats, node_nafm, node_mask, node_graph, edge_src,
    edge_dst, edge_feats, edge_mask, labels, graph_mask.
    Returns (graph_out (num_graphs, out), new_state)."""
    if cfg.message_fn != "edge_network":
        raise NotImplementedError(
            f"sparse path covers the fused edge_network family; "
            f"{cfg.message_fn} runs densely")
    if cfg.readout != "graph_level":
        raise NotImplementedError("sparse path readout: graph_level only")

    new_state = dict(state)
    h0 = batch["node_feats"]
    mask = batch["node_mask"]
    edge_feats = batch["edge_feats"]
    node_graph = batch["node_graph"]
    graph_mask = batch["graph_mask"]
    num_graphs = graph_mask.shape[0]

    h0 = h0 * mask
    edge_feats = edge_feats * batch["edge_mask"][:, None]

    if cfg.atom_encoder == "atom_ae":
        h0 = tanh_encoder_apply(params["atom_encoder"], h0)
    if cfg.bond_encoder == "bond_ae":
        edge_feats = tanh_encoder_apply(params["bond_encoder"], edge_feats)
    if cfg.input_norm:
        h0, new_state["aebn"] = bn1d_apply(
            params["aebn"], state["aebn"], h0, mask,
            training=training, axis_name=axis_name)
        # dense path normalizes bfm with the adjacency as its mask — the
        # packed equivalent masks by edge_mask (same real-bond rows)
        edge_feats, new_state["bebn"] = bn1d_apply(
            params["bebn"], state["bebn"], edge_feats,
            batch["edge_mask"][:, None],
            training=training, axis_name=axis_name)

    pens = [_edge_penultimates(mp, edge_feats, cfg)
            for mp in params["message"]]

    ma_bn_state = list(state.get("ma_bn", []))
    bn_state = list(state.get("bn", []))

    h = h0
    for step in range(cfg.message_steps):
        mi = 0 if cfg.share_message_weights else step
        ni = step if cfg.per_step_norms else 0
        msg_src = h0 if cfg.message_input == "initial" else h
        pen, pen0 = pens[mi]
        msgs = sparse_edge_network_fused(
            params["message"][mi], pen, pen0, msg_src,
            batch["edge_src"], batch["edge_dst"], node_graph, graph_mask,
            nf=cfg.node_features, mf=cfg.message_features, spmm_fn=spmm_fn)
        if cfg.msg_norm == "bn1d":
            msgs, ma_bn_state[ni] = bn1d_apply(
                params["ma_bn"][ni], ma_bn_state[ni], msgs, mask,
                training=training, axis_name=axis_name)
        hidden = h if cfg.update_hidden == "state" else h0
        h = gru_apply(params["gru"], msgs[None], hidden[None], mask[None])[0]
        if cfg.state_norm == "stateless":
            h = mask_batch_norm(h, mask, axis_name=axis_name)
        elif cfg.state_norm == "bn1d":
            h, bn_state[ni] = bn1d_apply(
                params["bn"][ni], bn_state[ni], h, mask,
                training=training, axis_name=axis_name)

    if ma_bn_state:
        new_state["ma_bn"] = ma_bn_state
    if bn_state:
        new_state["bn"] = bn_state

    readout_in = jnp.concatenate([h, h0], axis=-1)
    out = sparse_graph_level_output(params["readout"], readout_in, mask,
                                    node_graph, num_graphs)

    if cfg.output_norm:
        gm = graph_mask[:, None]
        out, new_state["obn"] = bn1d_apply(
            params["obn"], state["obn"], out, gm,
            training=training, axis_name=axis_name)

    return out, new_state
