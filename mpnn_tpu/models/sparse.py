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
from mpnn_tpu.ops.segments import SegmentSlots
from mpnn_tpu.ops.update import gru_apply


def _edge_penultimates(mparams, edge_feats, cfg: MPNNConfig,
                       edge_vid=None, edge_vfirst=None, edge_mlp_fn=None):
    """(E, pf) penultimate features and the zero-edge penultimate (1, pf).

    With a vocab (edge_vid/edge_vfirst from graphs.attach_edge_vocab) the
    ×50-tail MLP runs on the ≤vocab_cap DISTINCT rows and gathers — exact,
    since equal input rows map to equal outputs; this removes the dominant
    FLOP term of the flagship step (the per-edge weight-shared tail). The
    zero row rides the SAME chain (one scan, not two — the tail is ~100
    sequential tiny matmuls per train step otherwise, pure launch latency).

    edge_mlp_fn(e, head_ws, head_bs, shared_w) — optional fused Pallas
    chain (kernels/edge_mlp.py): one kernel launch instead of the
    tail_repeats-iteration lax.scan in each direction."""
    act = jax.nn.relu

    def run(x):
        if edge_mlp_fn is not None:
            return edge_mlp_fn(x,
                               tuple(l["w"] for l in mparams["head"]),
                               tuple(l["b"] for l in mparams["head"]),
                               mparams["shared"]["w"])
        return _edge_mlp_penultimate(mparams, x, act,
                                     cfg.edge_mlp_tail_repeats)

    zero = jnp.zeros((1, edge_feats.shape[-1]), edge_feats.dtype)
    pen_vocab = None
    if edge_vid is not None:
        # Gather AFTER any upstream edge transforms (encoders/input BN) so
        # the vocab sees transformed rows. Ids with no edge in this batch
        # (dataset-wide vocab) gather row 0 — their A matrix is unused.
        vocab = edge_feats[edge_vfirst]                 # (K, ef)
        pen_both = run(jnp.concatenate([vocab, zero], axis=0))
        pen_vocab = pen_both[:-1]
        pen0 = pen_both[-1:]
        pen = pen_vocab[edge_vid]
    else:
        pen_both = run(jnp.concatenate([edge_feats, zero], axis=0))
        pen = pen_both[:-1]
        pen0 = pen_both[-1:]
    return pen, pen0, pen_vocab


def sparse_edge_network_fused(mparams, pen, pen0, h, edge_src, edge_dst,
                              node_graph, graph_mask, *, nf: int, mf: int,
                              spmm_fn=None, pen_vocab=None, edge_vid=None,
                              spmm_vocab_fn=None, spmm_win=None,
                              slots=None):
    """m = SpMM(edges) + A(0)·S_graph + message_bias  (see module docstring).

    h: (node_cap, nf); returns (node_cap, mf). Three SpMM strategies:
      * pen_vocab/edge_vid present — A-FORM: fold the penultimate table into
        per-vocab-id matrices A_k = Σ_p (pen_k−pen_0)[p]·W̃[p] (K,mf,nf) —
        the EdgeNetwork step becomes a GGNN-type step; dispatched to the
        Pallas windowed one-hot kernel (kernels/spmm.py) via spmm_vocab_fn,
        else an XLA (K,N,mf)-gather — both avoid the (N,pf,mf) blow-up;
      * spmm_fn — legacy per-edge hook (parallel/edge_partition.py);
      * default — XLA einsum + segment_sum on per-edge penultimates."""
    node_cap = h.shape[0]
    pf = pen.shape[-1]
    wf = mparams["final"]["w"].reshape(pf, mf, nf)
    bf = mparams["final"]["b"].reshape(mf, nf)

    if pen_vocab is not None:
        ptable = pen_vocab - pen0                           # (K, pf)
        amat = jnp.einsum("kp,pmf->kmf", ptable, wf,
                          preferred_element_type=h.dtype)   # (K, mf, nf)
        if spmm_vocab_fn is not None and spmm_win is not None:
            agg = spmm_vocab_fn(amat, h, edge_vid, edge_src, edge_dst,
                                spmm_win)
        else:
            v2 = jnp.einsum("kmf,nf->knm", amat, h,
                            preferred_element_type=h.dtype)  # (K,N,mf)
            edge_msg = v2[edge_vid, edge_src]
            if slots is not None and slots.has_edges:
                agg = slots.dst_sum(edge_msg)
            else:
                agg = jax.ops.segment_sum(edge_msg, edge_dst,
                                          num_segments=node_cap)
    elif spmm_fn is not None:
        ptilde = pen - pen0                                 # (E, pf)
        agg = spmm_fn(ptilde, h, edge_src, edge_dst, wf)
    else:
        ptilde = pen - pen0
        v = jnp.einsum("pmf,nf->npm", wf, h,
                       preferred_element_type=h.dtype)      # (node_cap,pf,mf)
        edge_msg = jnp.einsum("ep,epm->em", ptilde, v[edge_src],
                              preferred_element_type=h.dtype)
        if slots is not None and slots.has_edges:
            agg = slots.dst_sum(edge_msg)
        else:
            agg = jax.ops.segment_sum(edge_msg, edge_dst,
                                      num_segments=node_cap)

    # per-graph rank-1 correction: A(0) · Σ_{w∈g} h_w
    num_graphs = graph_mask.shape[0]
    a0 = jnp.einsum("p,pmf->mf", pen0[0], wf) + bf          # (mf, nf)
    if slots is not None and slots.has_graph:
        # scatter-free (ops/segments.py): per-graph sum + broadcast are both
        # gathers; padded nodes read exactly the zero the sentinel row held
        s = slots.graph_sum(h)                              # (G, nf)
        base = slots.graph_broadcast(s @ a0.T)              # (node_cap, mf)
    else:
        s = jax.ops.segment_sum(h, node_graph, num_segments=num_graphs + 1)
        base = s[node_graph] @ a0.T                         # (node_cap, mf)
    return agg + base + mparams["message_bias"]


def sparse_ggnn_fused(mparams, bond_types, h, edge_src, edge_dst, *,
                      nf: int, mf: int, spmm_vocab_fn=None, spmm_win=None,
                      slots=None):
    """GGNN sparse message+aggregate: A_0 is pinned to zero (ggnn_msg_pass.py:19)
    so non-edges contribute nothing — pure edge-sum, exactly the dense result.

    bond_types: (E,) int edge-type ids (0 = padded edge → zero matrix).
    GGNN is natively in A-form, so the Pallas windowed SpMM kernel
    (kernels/spmm.py) applies directly when spmm_vocab_fn is given."""
    node_cap = h.shape[0]
    w = jnp.concatenate([jnp.zeros((1, mf, nf), mparams["adj_w"].dtype),
                         mparams["adj_w"]], axis=0)         # (T+1, mf, nf)
    if spmm_vocab_fn is not None and spmm_win is not None:
        agg = spmm_vocab_fn(w, h, bond_types, edge_src, edge_dst, spmm_win)
    else:
        v = jnp.einsum("tmf,nf->tnm", w, h,
                       preferred_element_type=h.dtype)      # (T+1,node,mf)
        edge_msg = v[bond_types, edge_src]                  # (E, mf)
        if slots is not None and slots.has_edges:
            agg = slots.dst_sum(edge_msg)
        else:
            agg = jax.ops.segment_sum(edge_msg, edge_dst,
                                      num_segments=node_cap)
    return agg + mparams["message_bias"]


def sparse_att_edge_network(mparams, pen, pen0, h, edge_feats, edge_src,
                            edge_dst, node_graph, graph_mask, *, nf: int,
                            mf: int, aggregation: str = "adj",
                            pen_vocab=None, edge_vid=None, edge_vfirst=None,
                            sddmm_fn=None, spmm_win=None, slots=None):
    """Attention message family, sparsified exactly for the aggregators whose
    dense semantics are padding-independent:

      per-pair msg m(v,w) = A(e_vw) · (softmax_feat(attn([h_v ‖ e_vw])) ⊙ h_w)

      * 'adj' (adjacent_message_agg.py): selects real edges only → pure
        edge-sum of per-edge messages.
      * 'att' (attention_message_agg.py): the learned gate softmaxes a
        singleton axis → constant 1.0 weights; the dense sum runs over ALL
        pairs, but padded h_w = 0, so the non-edge part decomposes per node:
        A(0)·(g0_v ⊙ S_g) with g0_v = softmax(attn([h_v ‖ 0])) — a rank-1
        correction like the EdgeNetwork A0 path.
      * 'wadj' is intrinsically padding-dependent (softmax over the raw
        dense adjacency row counts padded columns) and stays dense.
    """
    node_cap = h.shape[0]
    pf = pen.shape[-1]
    wf = mparams["final"]["w"].reshape(pf, mf, nf)
    bf = mparams["final"]["b"].reshape(mf, nf)
    if sddmm_fn is not None and pen_vocab is not None \
            and spmm_win is not None:
        # fused Pallas SDDMM (kernels/sddmm.py): per-vocab-id matrices
        # A'_k = Σ_p pen_k[p]·W̃[p] + B_f  (att keeps the final bias)
        aprime = jnp.einsum("kp,pmf->kmf", pen_vocab, wf,
                            preferred_element_type=h.dtype) + bf
        evocab = edge_feats[edge_vfirst]
        agg = sddmm_fn(aprime, evocab, mparams["attn"]["w"],
                       mparams["attn"]["b"], h, edge_vid, edge_src,
                       edge_dst, spmm_win)
    else:
        # NEGATIVE RESULT (measured, do not re-try without new evidence):
        # hoisting the vocab-valued pieces out of edge space — per-vocab
        # A'_k matrices gathered per edge (aprime[edge_vid]) plus a split
        # attn (h·W_h per node + e_k·W_e per vocab) — measured 8.81
        # ms/step vs this path's 5.67 at batch 1024. TPU per-edge matrix
        # gathers pad each (mf, nf) row to tile granularity and the
        # batched per-edge matvec can't use the MXU, while XLA FUSES the
        # two einsums below (the (E, pf, mf) intermediate is never
        # materialized). Same lesson as ops/segments.py's slot tables.
        use_slots = slots is not None and slots.has_edges
        # per-edge gate: softmax over features of attn([h_dst ‖ e])
        h_dst = slots.gather_nodes(h, "dst") if use_slots else h[edge_dst]
        h_src = slots.gather_nodes(h, "src") if use_slots else h[edge_src]
        cat = jnp.concatenate([h_dst, edge_feats], axis=-1)
        gate = jax.nn.softmax(linear_apply(mparams["attn"], cat), axis=-1)
        g = gate * h_src                                    # (E, nf)
        # per-edge matrix application via the penultimate re-association
        t = jnp.einsum("pmf,ef->epm", wf, g,
                       preferred_element_type=h.dtype)
        edge_msg = jnp.einsum("ep,epm->em", pen, t,
                              preferred_element_type=h.dtype) + g @ bf.T
        if use_slots:
            agg = slots.dst_sum(edge_msg)
        else:
            agg = jax.ops.segment_sum(edge_msg, edge_dst,
                                      num_segments=node_cap)

    if aggregation == "att":
        # non-edge correction: A(0)·(g0_v ⊙ (S_g − 0)) summed over all w
        num_graphs = graph_mask.shape[0]
        use_g = slots is not None and slots.has_graph
        use_e = slots is not None and slots.has_edges
        zero_e = jnp.zeros((1, edge_feats.shape[-1]), h.dtype)
        cat0 = jnp.concatenate(
            [h, jnp.broadcast_to(zero_e, (node_cap, zero_e.shape[-1]))],
            axis=-1)
        g0 = jax.nn.softmax(linear_apply(mparams["attn"], cat0), axis=-1)
        a0 = jnp.einsum("p,pmf->mf", pen0[0], wf) + bf
        if use_g:
            sn = slots.graph_broadcast(slots.graph_sum(h))  # (node_cap, nf)
        else:
            s = jax.ops.segment_sum(h, node_graph,
                                    num_segments=num_graphs + 1)
            sn = s[node_graph]
        gated_sum = g0 * sn                                 # (node_cap, nf)
        agg = agg + gated_sum @ a0.T
        # subtract the double-counted real-edge A(0) part? No: the dense
        # 'att' sum is Σ_w m(v,w) over ALL w; real edges use A(e), non-edges
        # use A(0) with the zero-e gate. The edge-sum above used the real
        # gate+A(e); the correction must therefore exclude real neighbors:
        if use_e:
            corr = slots.dst_sum(slots.gather_nodes(g0, "dst")
                                 * slots.gather_nodes(h, "src"))
        else:
            corr = jax.ops.segment_sum(
                (g0[edge_dst] * h[edge_src]), edge_dst,
                num_segments=node_cap)
        agg = agg - corr @ a0.T
    return agg


def sparse_bilinear(h, edge_feats, edge_src, edge_dst, *, nf: int,
                    slots=None):
    """Bilinear message (ef == nf³), adj-aggregated: W(0) = 0 so non-edges
    vanish — pure edge-sum of h_dstᵀ·W(e)·h_src chains
    (bilinear_edge_network.py literal index order, see ops/message.py)."""
    node_cap = h.shape[0]
    e = edge_feats.shape[-1]
    assert e == nf ** 3
    use_slots = slots is not None and slots.has_edges
    w = edge_feats.reshape(-1, nf, nf, nf)
    h_src = slots.gather_nodes(h, "src") if use_slots else h[edge_src]
    h_dst = slots.gather_nodes(h, "dst") if use_slots else h[edge_dst]
    x = jnp.einsum("en,enij->eij", h_src, w)
    msg = jnp.einsum("ej,eij->ei", h_dst, x)
    if use_slots:
        return slots.dst_sum(msg)
    return jax.ops.segment_sum(msg, edge_dst, num_segments=node_cap)


def sparse_set2vec(rparams, x, node_mask, node_graph, num_graphs: int, *,
                   time_steps: int = 100, batch_softmax: bool = True,
                   slots=None):
    """Packed set2set readout (set2vec.py semantics on the flat node axis).
    batch_softmax=True normalizes over every real node in the whole batch
    (the reference's dim-0 softmax, set2vec.py:139); False per graph."""
    node_cap, width = x.shape
    dtype = x.dtype
    mprev = jnp.zeros((num_graphs, 2 * width), dtype)
    cprev = jnp.zeros((num_graphs, width), dtype)
    add_mask = (1.0 - node_mask[:, 0]) * _BIG_NEGATIVE

    from mpnn_tpu.ops.readout import _lstm_hidden_apply

    use_slots = slots is not None and slots.has_graph

    def step(carry, _):
        mprev, cprev = carry
        m, c = _lstm_hidden_apply(rparams["lstm"], mprev, cprev)
        query = linear_apply(rparams["q_attn"], m)          # (G, width)
        if use_slots:
            # zeros at padded nodes instead of the clipped last-graph query;
            # identical downstream — add_mask (−1e9) zeroes their attention
            # either way, and the backward becomes a gather, not a scatter
            q_per_node = slots.graph_broadcast(query)
        else:
            q_per_node = query[jnp.clip(node_graph, 0, num_graphs - 1)]
        energies = linear_apply(
            rparams["e_attn"], jnp.tanh(q_per_node + x))[:, 0]
        energies = energies + add_mask
        if batch_softmax:
            att = jax.nn.softmax(energies)                  # over all nodes
        else:
            emax = jax.ops.segment_max(energies, node_graph,
                                       num_segments=num_graphs + 1)
            z = jnp.exp(energies - emax[node_graph])
            denom = jax.ops.segment_sum(z, node_graph,
                                        num_segments=num_graphs + 1)
            att = z / denom[node_graph]
        if use_slots:
            read = slots.graph_sum(att[:, None] * x)
        else:
            read = jax.ops.segment_sum(att[:, None] * x, node_graph,
                                       num_segments=num_graphs + 1)[:-1]
        m_out = jnp.concatenate([m, read], axis=1)
        return (m_out, c), None

    (m_final, _), _ = jax.lax.scan(step, (mprev, cprev), None,
                                   length=time_steps)
    return m_final


def sparse_graph_level_output(rparams, x, node_mask, node_graph,
                              num_graphs: int, slots=None):
    """Packed gated readout: per-node gating then segment-sum per graph
    (graph_level_output.py:36-47 semantics on the flat node axis)."""
    xm = x * node_mask
    gated = jax.nn.softmax(linear_apply(rparams["i"], xm), axis=-1) \
        * linear_apply(rparams["j"], xm) * node_mask
    if slots is not None and slots.has_graph:
        return slots.graph_sum(gated)
    return jax.ops.segment_sum(gated, node_graph,
                               num_segments=num_graphs + 1)[:-1]


def fold_recurrence_emas(ma_state, bn_state, steps, ma_stats, step_stats):
    """Running-stat EMA updates a fused recurrence kernel skipped: the
    SHARED ma_bn sees the same (constant-message) stats `steps` times, the
    shared bn pair sees each step's stats once — exactly what the
    sequential bn1d_apply loop would have recorded (momentum 0.1). The
    single source of truth for both the fused-recurrence hook below and
    the whole-step path (models/fused_train.py)."""
    mom = 0.1
    ma_s = dict(ma_state)
    for _ in range(steps):
        ma_s = {"running_mean": (1 - mom) * ma_s["running_mean"]
                + mom * ma_stats[0],
                "running_var": (1 - mom) * ma_s["running_var"]
                + mom * ma_stats[1]}
    bn_s = dict(bn_state)
    for mean_t, var_t in step_stats:
        bn_s = {"running_mean": (1 - mom) * bn_s["running_mean"]
                + mom * mean_t,
                "running_var": (1 - mom) * bn_s["running_var"]
                + mom * var_t}
    return ma_s, bn_s


def recurrence_eligible(cfg: MPNNConfig, *, training: bool,
                        axis_name=None) -> bool:
    """True when the fused Pallas recurrence (kernels/recurrence.py) computes
    exactly this config's step loop: messages constant across steps
    (message_input='initial' + shared weights) and one shared bn1d pair.
    GGNN qualifies too — it is natively in A-form (per-bond-type matrices,
    A_0 pinned to zero), so its messages are equally step-constant."""
    return (training and axis_name is None
            and cfg.message_fn in ("edge_network", "ggnn")
            and cfg.message_features == cfg.node_features
            and cfg.share_message_weights
            and cfg.message_input == "initial"
            and cfg.update_hidden == "state"
            and cfg.msg_norm == "bn1d" and cfg.state_norm == "bn1d"
            and not cfg.per_step_norms
            and not cfg.concat_state_history
            and not cfg.remat)


def sparse_mpnn_apply(params, state, cfg: MPNNConfig, batch, *,
                      training: bool, axis_name: Optional[str] = None,
                      spmm_fn=None, spmm_vocab_fn=None, sddmm_fn=None,
                      recurrence_fn=None, edge_mlp_fn=None):
    """Packed-batch MPNN forward; parameters from mpnn_init (shared with the
    dense path). Supports edge_network / ggnn / att_edge_network (adj + att
    aggregations) / bilinear messages, GRU update, masked norms, and both
    readouts (graph_level + set2vec) — everything except the intrinsically
    padding-dependent wadj aggregation, which is rejected below.

    batch keys: node_feats, node_nafm, node_mask, node_graph, edge_src,
    edge_dst, edge_feats, edge_mask, labels, graph_mask.
    Returns (graph_out (num_graphs, out), new_state)."""
    if cfg.message_fn == "att_edge_network" and cfg.aggregation == "wadj":
        raise NotImplementedError(
            "wadj aggregation softmaxes the raw dense adjacency row — its "
            "result depends on the dense padding width, so it has no "
            "padding-free sparse form; use the dense path")

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

    # scatter-free segment tables (ops/segments.py) when the batch carries
    # them (graphs.attach_segment_slots); every fallback stays in place
    slots = SegmentSlots(batch)

    needs_pen = cfg.message_fn in ("edge_network", "att_edge_network")
    vid = batch.get("edge_vid")
    vfirst = batch.get("edge_vfirst")
    spmm_win = batch.get("spmm_win")
    pens = ([_edge_penultimates(mp, edge_feats, cfg, vid, vfirst,
                                edge_mlp_fn)
             for mp in params["message"]] if needs_pen else None)

    ma_bn_state = list(state.get("ma_bn", []))
    bn_state = list(state.get("bn", []))

    if recurrence_fn is not None and recurrence_eligible(
            cfg, training=training, axis_name=axis_name):
        # messages are CONSTANT across steps — compute them once, run the
        # whole BN→GRU→BN chain in the fused kernel, then apply the same
        # running-stat EMAs the sequential loop would have applied
        if cfg.message_fn == "ggnn":
            msgs_raw = sparse_ggnn_fused(
                params["message"][0], batch["edge_types"], h0,
                batch["edge_src"], batch["edge_dst"],
                nf=cfg.node_features, mf=cfg.message_features,
                spmm_vocab_fn=spmm_vocab_fn, spmm_win=spmm_win,
                slots=slots)
        else:
            pen, pen0, pen_vocab = pens[0]
            msgs_raw = sparse_edge_network_fused(
                params["message"][0], pen, pen0, h0,
                batch["edge_src"], batch["edge_dst"], node_graph,
                graph_mask, nf=cfg.node_features, mf=cfg.message_features,
                spmm_fn=spmm_fn, pen_vocab=pen_vocab, edge_vid=vid,
                spmm_vocab_fn=spmm_vocab_fn, spmm_win=spmm_win, slots=slots)
        h, ma_stats, step_stats = recurrence_fn(
            msgs_raw, h0, mask, params["gru"], params["ma_bn"][0],
            params["bn"][0])
        ma_bn_state[0], bn_state[0] = fold_recurrence_emas(
            ma_bn_state[0], bn_state[0], cfg.message_steps,
            ma_stats, step_stats)
        new_state["ma_bn"] = ma_bn_state
        new_state["bn"] = bn_state
        readout_in = jnp.concatenate([h, h0], axis=-1)
        if cfg.readout == "graph_level":
            out = sparse_graph_level_output(params["readout"], readout_in,
                                            mask, node_graph, num_graphs,
                                            slots=slots)
        else:
            out = sparse_set2vec(params["readout"], readout_in, mask,
                                 node_graph, num_graphs,
                                 time_steps=cfg.set2vec_steps,
                                 batch_softmax=cfg.set2vec_batch_softmax,
                                 slots=slots)
        if cfg.output_norm:
            gm = graph_mask[:, None]
            out, new_state["obn"] = bn1d_apply(
                params["obn"], state["obn"], out, gm,
                training=training, axis_name=axis_name)
        return out, new_state

    # With messages computed from the INITIAL features and shared message
    # weights, msgs are IDENTICAL every step: computing them once inside
    # the loop would still run the backward of the message op once PER
    # STEP (JAX does not merge pullbacks of a repeated primal — profiled
    # as 6 SpMM-bwd kernel launches per train step). Hoist the common case.
    msgs_const = cfg.message_input == "initial" \
        and cfg.share_message_weights
    cached_msgs = None

    h = h0
    history = [h0]
    for step in range(cfg.message_steps):
        if msgs_const and cached_msgs is not None:
            msgs = cached_msgs
            ni = step if cfg.per_step_norms else 0
            if cfg.msg_norm == "bn1d":
                msgs, ma_bn_state[ni] = bn1d_apply(
                    params["ma_bn"][ni], ma_bn_state[ni], msgs, mask,
                    training=training, axis_name=axis_name)
            hidden = h if cfg.update_hidden == "state" else h0
            h = gru_apply(params["gru"], msgs[None], hidden[None],
                          mask[None])[0]
            if cfg.state_norm == "stateless":
                h = mask_batch_norm(h, mask, axis_name=axis_name)
            elif cfg.state_norm == "bn1d":
                h, bn_state[ni] = bn1d_apply(
                    params["bn"][ni], bn_state[ni], h, mask,
                    training=training, axis_name=axis_name)
            history.append(h)
            continue
        mi = 0 if cfg.share_message_weights else step
        ni = step if cfg.per_step_norms else 0
        msg_src = h0 if cfg.message_input == "initial" else h
        if cfg.message_fn == "edge_network":
            pen, pen0, pen_vocab = pens[mi]
            msgs = sparse_edge_network_fused(
                params["message"][mi], pen, pen0, msg_src,
                batch["edge_src"], batch["edge_dst"], node_graph,
                graph_mask, nf=cfg.node_features,
                mf=cfg.message_features, spmm_fn=spmm_fn,
                pen_vocab=pen_vocab, edge_vid=vid,
                spmm_vocab_fn=spmm_vocab_fn, spmm_win=spmm_win,
                slots=slots)
        elif cfg.message_fn == "ggnn":
            msgs = sparse_ggnn_fused(
                params["message"][mi], batch["edge_types"], msg_src,
                batch["edge_src"], batch["edge_dst"],
                nf=cfg.node_features, mf=cfg.message_features,
                spmm_vocab_fn=spmm_vocab_fn, spmm_win=spmm_win,
                slots=slots)
        elif cfg.message_fn == "att_edge_network":
            pen, pen0, pen_vocab = pens[mi]
            msgs = sparse_att_edge_network(
                params["message"][mi], pen, pen0, msg_src, edge_feats,
                batch["edge_src"], batch["edge_dst"], node_graph,
                graph_mask, nf=cfg.node_features,
                mf=cfg.message_features, aggregation=cfg.aggregation,
                pen_vocab=pen_vocab, edge_vid=vid,
                edge_vfirst=vfirst, sddmm_fn=sddmm_fn,
                spmm_win=spmm_win, slots=slots)
        elif cfg.message_fn == "bilinear":
            if cfg.aggregation != "adj":
                raise NotImplementedError(
                    "sparse bilinear supports adj aggregation")
            msgs = sparse_bilinear(msg_src, edge_feats, batch["edge_src"],
                                   batch["edge_dst"],
                                   nf=cfg.node_features, slots=slots)
        else:
            raise NotImplementedError(cfg.message_fn)
        if msgs_const:
            cached_msgs = msgs
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
        history.append(h)

    if ma_bn_state:
        new_state["ma_bn"] = ma_bn_state
    if bn_state:
        new_state["bn"] = bn_state

    if cfg.concat_state_history:
        readout_in = jnp.concatenate(history, axis=-1)
    else:
        readout_in = jnp.concatenate([h, h0], axis=-1)

    if cfg.readout == "graph_level":
        out = sparse_graph_level_output(params["readout"], readout_in, mask,
                                        node_graph, num_graphs, slots=slots)
    elif cfg.readout == "set2vec":
        out = sparse_set2vec(params["readout"], readout_in, mask, node_graph,
                             num_graphs, time_steps=cfg.set2vec_steps,
                             batch_softmax=cfg.set2vec_batch_softmax,
                             slots=slots)
    else:
        raise NotImplementedError(cfg.readout)

    if cfg.output_norm:
        gm = graph_mask[:, None]
        out, new_state["obn"] = bn1d_apply(
            params["obn"], state["obn"], out, gm,
            training=training, axis_name=axis_name)

    return out, new_state
