"""The configurable MPNN: h ← Update(Agg(Message(h, e)), h, mask); Readout.

A single init/apply pair parameterized by MPNNConfig reproduces every
reference model composition (SURVEY.md §2.4). Pure functions: `params` holds
weights, `state` holds BN running stats, both plain nested dicts.

TPU notes:
  - message steps unroll statically; when the message is constant across
    steps (message_input='initial' + shared weights, the common reference
    case) XLA CSEs the repeated message computation away, leaving only the
    GRU recurrence — no manual caching needed (the reference's
    `reuse_graph_tensors` flag becomes a compiler no-op here).
  - the edge-MLP penultimate features are computed once per forward and
    reused by every step that needs per-pair matrices.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mpnn_tpu.models.config import MPNNConfig
from mpnn_tpu.ops import (
    adj_agg, att_agg, att_agg_init, att_edge_network_apply,
    att_edge_network_init, bilinear_edge_network_apply, bn1d_apply, bn1d_init,
    edge_network_fused, edge_network_init, edge_network_precompute,
    ggnn_fused, ggnn_init, graph_level_output_apply, graph_level_output_init,
    gru_init, gru_apply, mask_batch_norm, set2vec_apply, set2vec_init,
    wadj_agg,
)
from mpnn_tpu.ops.autoencoders import (
    tanh_autoencoder_init, tanh_encoder_apply,
)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _message_init(key, cfg: MPNNConfig):
    nf, ef, mf = cfg.node_features, cfg.edge_features, cfg.message_features
    init = "kaiming_relu" if cfg.reference_init else "torch_default"
    if cfg.message_fn == "edge_network":
        return edge_network_init(key, nf, ef, mf, cfg.edge_mlp_tail_repeats,
                                 init=init)
    if cfg.message_fn == "att_edge_network":
        return att_edge_network_init(key, nf, ef, mf,
                                     cfg.edge_mlp_tail_repeats, init=init)
    if cfg.message_fn == "ggnn":
        return ggnn_init(key, nf, cfg.ggnn_num_edge_types, mf)
    if cfg.message_fn == "bilinear":
        return {}  # parameter-free
    raise ValueError(cfg.message_fn)


def mpnn_init(key, cfg: MPNNConfig, dtype=jnp.float32):
    nf, mf = cfg.node_features, cfg.message_features
    keys = jax.random.split(key, 8)
    params, state = {}, {}

    n_msg = 1 if cfg.share_message_weights else cfg.message_steps
    mkeys = jax.random.split(keys[0], n_msg)
    params["message"] = [_message_init(k, cfg) for k in mkeys]

    if cfg.aggregation == "att":
        params["agg"] = att_agg_init(keys[1], adj_dim=1, dtype=dtype)

    params["gru"] = gru_init(keys[2], nf, mf, dtype)

    n_norm = cfg.message_steps if cfg.per_step_norms else 1
    if cfg.msg_norm == "bn1d":
        pairs = [bn1d_init(mf, dtype) for _ in range(n_norm)]
        params["ma_bn"] = [p for p, _ in pairs]
        state["ma_bn"] = [s for _, s in pairs]
    if cfg.state_norm == "bn1d":
        pairs = [bn1d_init(nf, dtype) for _ in range(n_norm)]
        params["bn"] = [p for p, _ in pairs]
        state["bn"] = [s for _, s in pairs]

    if cfg.atom_encoder == "atom_ae":
        # reference shape 30→15→8 generalized: in → max(in//2, e) → e
        in_dim, e_dim = cfg.atom_encoder_in, nf
        ae_p, ae_s = tanh_autoencoder_init(
            keys[3], in_dim, max(in_dim // 2, e_dim), e_dim, dtype)
        params["atom_encoder"], state["atom_encoder"] = ae_p, ae_s
    if cfg.bond_encoder == "bond_ae":
        in_dim, e_dim = cfg.bond_encoder_in, cfg.edge_features
        be_p, be_s = tanh_autoencoder_init(
            keys[4], in_dim, max(in_dim // 2, e_dim), e_dim, dtype)
        params["bond_encoder"], state["bond_encoder"] = be_p, be_s
    if cfg.input_norm:
        p, s = bn1d_init(nf, dtype)
        params["aebn"], state["aebn"] = p, s
        p, s = bn1d_init(cfg.edge_features, dtype)
        params["bebn"], state["bebn"] = p, s
    if cfg.output_norm:
        p, s = bn1d_init(cfg.output_dim, dtype)
        params["obn"], state["obn"] = p, s

    rnf = cfg.readout_node_features
    if cfg.readout == "graph_level":
        params["readout"] = graph_level_output_init(
            keys[5], rnf, cfg.output_dim, dtype,
            init="kaiming_relu" if cfg.reference_init else "torch_default")
    elif cfg.readout == "set2vec":
        params["readout"] = set2vec_init(keys[5], rnf, cfg.set2vec_steps,
                                         dtype=dtype)
    else:
        raise ValueError(cfg.readout)

    return params, state


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def _compute_message(cfg: MPNNConfig, mparams, pen, h, bfm, adj,
                     agg_params):
    """One message+aggregate evaluation → (B, N, mf)."""
    nf, mf = cfg.node_features, cfg.message_features
    if cfg.message_fn == "edge_network":
        return edge_network_fused(mparams, pen, h, nf=nf, mf=mf)
    if cfg.message_fn == "ggnn":
        return ggnn_fused(mparams, bfm, h, nf=nf, mf=mf)
    if cfg.message_fn == "att_edge_network":
        per_pair = att_edge_network_apply(mparams, pen, h, bfm, nf=nf, mf=mf)
    elif cfg.message_fn == "bilinear":
        per_pair = bilinear_edge_network_apply(h, bfm, nf=nf)
    else:
        raise ValueError(cfg.message_fn)
    if cfg.aggregation == "adj":
        return adj_agg(per_pair, adj)
    if cfg.aggregation == "wadj":
        return wadj_agg(per_pair, adj)
    if cfg.aggregation == "att":
        return att_agg(agg_params, per_pair, adj)
    raise ValueError(cfg.aggregation)


def mpnn_apply(params, state, cfg: MPNNConfig, afm, bfm, adj, mask, *,
               training: bool, axis_name: Optional[str] = None):
    """Full MPNN forward.

    afm: (B,N,nf_in) node features; bfm: (B,N,N,ef) dense bond features (or
    (B,N,N) int types for ggnn); adj: (B,N,N); mask: (B,N,1).
    Returns (graph_output (B,out), new_state)."""
    new_state = dict(state)

    # The reference relies on the collator zero-padding afm/bfm
    # (data_loader.py:12-17); we enforce the same invariant explicitly so
    # padded-slot garbage can never leak into the fused neighbor sums
    # (equivalent on well-formed data, robust otherwise).
    afm = afm * mask
    if cfg.message_fn == "ggnn":
        bfm = jnp.where(adj > 0, bfm, jnp.zeros_like(bfm))
    else:
        bfm = bfm * adj[..., None]

    # in-graph frozen feature encoders + input norms
    # (normed_encoded_basic_model.py:67-68: afm ← aebn(ae(afm), mask),
    #  bfm ← bebn(be(bfm), adj))
    if cfg.atom_encoder == "atom_ae":
        afm = tanh_encoder_apply(params["atom_encoder"], afm)
    if cfg.bond_encoder == "bond_ae":
        bfm = tanh_encoder_apply(params["bond_encoder"], bfm)
    if cfg.input_norm:
        afm, new_state["aebn"] = bn1d_apply(
            params["aebn"], state["aebn"], afm, mask,
            training=training, axis_name=axis_name)
        bfm, new_state["bebn"] = bn1d_apply(
            params["bebn"], state["bebn"], bfm, adj,
            training=training, axis_name=axis_name)

    needs_pen = cfg.message_fn in ("edge_network", "att_edge_network")
    pens = None
    if needs_pen:
        pens = [edge_network_precompute(
                    mp, bfm, nf=cfg.node_features, mf=cfg.message_features,
                    tail_repeats=cfg.edge_mlp_tail_repeats)
                for mp in params["message"]]

    ma_bn_state = list(state.get("ma_bn", []))
    bn_state = list(state.get("bn", []))

    def compute_msgs(mi, msg_src, bfm, adj):
        return _compute_message(cfg, params["message"][mi],
                                pens[mi] if pens is not None else None,
                                msg_src, bfm, adj, params.get("agg"))

    if cfg.remat:
        # rematerialize the message computation in the backward pass —
        # trades FLOPs for the per-step activation memory (jax.checkpoint)
        compute_msgs = jax.checkpoint(compute_msgs,
                                      static_argnums=(0,))

    h = afm
    history = [afm]
    for step in range(cfg.message_steps):
        mi = 0 if cfg.share_message_weights else step
        ni = step if cfg.per_step_norms else 0
        msg_src = afm if cfg.message_input == "initial" else h
        msgs = compute_msgs(mi, msg_src, bfm, adj)
        if cfg.msg_norm == "bn1d":
            msgs, ma_bn_state[ni] = bn1d_apply(
                params["ma_bn"][ni], ma_bn_state[ni], msgs, mask,
                training=training, axis_name=axis_name)
        hidden = h if cfg.update_hidden == "state" else afm
        h = gru_apply(params["gru"], msgs, hidden, mask)
        if cfg.state_norm == "stateless":
            h = mask_batch_norm(h, mask, axis_name=axis_name)
        elif cfg.state_norm == "bn1d":
            h, bn_state[ni] = bn1d_apply(
                params["bn"][ni], bn_state[ni], h, mask,
                training=training, axis_name=axis_name)
        history.append(h)

    if ma_bn_state:
        new_state["ma_bn"] = ma_bn_state
    if bn_state:
        new_state["bn"] = bn_state

    if cfg.concat_state_history:
        readout_in = jnp.concatenate(history, axis=-1)
    else:
        readout_in = jnp.concatenate([h, afm], axis=-1)

    if cfg.readout == "graph_level":
        out = graph_level_output_apply(params["readout"], readout_in, mask)
    else:
        out = set2vec_apply(params["readout"], readout_in, mask,
                            time_steps=cfg.set2vec_steps,
                            batch_softmax=cfg.set2vec_batch_softmax)

    if cfg.output_norm:
        # obn normalizes the (B, out) graph vectors with an all-ones mask
        # (normed_encoded_basic_model_ecfp.py:70-71 passes the node mask of a
        # (B, out) tensor — flattened row mask of ones is the coherent read)
        ones = jnp.ones(out.shape[:1] + (1,), out.dtype)
        out, new_state["obn"] = bn1d_apply(
            params["obn"], state["obn"], out, ones,
            training=training, axis_name=axis_name)

    return out, new_state
