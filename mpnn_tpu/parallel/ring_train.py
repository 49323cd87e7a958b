"""Fully ring-sharded MPNN forward: node states NEVER materialize on one
device.

parallel/ring.py shards one SpMM; this module runs the entire flagship
forward under a single shard_map over the ring axis:

  - node states, masks, and graph ids live as (D, S, ·) shards;
  - each message step runs the D-round ppermute ring for the edge term,
    plus the psum'd per-graph A0 correction;
  - masked BN statistics psum over the ring (exact global stats);
  - GRU is per-node (local);
  - the gated readout segment-sums locally by GLOBAL graph id and psums,
    yielding replicated (G, out) graph embeddings.

Together with data parallelism on an outer axis this is the full
DP × ring-sharded recipe for batches whose node state exceeds one chip's
memory — the graph analog of FSDP-with-ring-attention. jax.grad
differentiates through everything (ppermute/psum transposes), verified
exact against the unsharded sparse path in tests/test_ring.py.

Supported surface (flagship family): edge_network messages, bn1d/stateless/
none norms, GRU update, graph_level readout.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from mpnn_tpu.models.config import MPNNConfig
from mpnn_tpu.models.sparse import _edge_penultimates
from mpnn_tpu.ops.linear import linear_apply
from mpnn_tpu.ops.norm import bn1d_apply, mask_batch_norm
from mpnn_tpu.ops.update import gru_apply


def _ring_edge_term(h, src_b, dst_b, pt_b, wf, axis: str, d: int):
    """D-round ring: returns (S, mf) local aggregation of the edge term.
    h: (S, nf) local shard; buckets indexed by source shard."""
    s = h.shape[0]
    _, mf, _ = wf.shape
    my = jax.lax.axis_index(axis)

    def round_body(r, carry):
        h_rot, acc = carry
        q = (my - r) % d
        pt = jnp.take(pt_b, q, axis=0)
        src = jnp.take(src_b, q, axis=0)
        dst = jnp.take(dst_b, q, axis=0)
        v = jnp.einsum("pmf,nf->npm", wf, h_rot,
                       preferred_element_type=h.dtype)
        msg = jnp.einsum("ep,epm->em", pt, v[src],
                         preferred_element_type=h.dtype)
        acc = acc + jax.ops.segment_sum(msg, dst, num_segments=s)
        h_next = jax.lax.ppermute(
            h_rot, axis, perm=[(i, (i + 1) % d) for i in range(d)])
        return h_next, acc

    acc0 = jax.lax.pcast(jnp.zeros((s, mf), h.dtype), (axis,), to="varying")
    _, acc = jax.lax.fori_loop(0, d, round_body, (h, acc0))
    return acc


def _ring_edge_term_ggnn(h, src_b, dst_b, type_b, w, axis: str, d: int):
    """GGNN ring rounds: per-edge-TYPE matrices (T+1, mf, nf), type 0 = 0
    matrix so padded bucket slots contribute nothing (ggnn_msg_pass.py:19)."""
    s = h.shape[0]
    _, mf, _ = w.shape
    my = jax.lax.axis_index(axis)

    def round_body(r, carry):
        h_rot, acc = carry
        q = (my - r) % d
        types = jnp.take(type_b, q, axis=0)
        src = jnp.take(src_b, q, axis=0)
        dst = jnp.take(dst_b, q, axis=0)
        v2 = jnp.einsum("tmf,nf->tnm", w, h_rot,
                        preferred_element_type=h.dtype)
        msg = v2[types, src]
        acc = acc + jax.ops.segment_sum(msg, dst, num_segments=s)
        h_next = jax.lax.ppermute(
            h_rot, axis, perm=[(i, (i + 1) % d) for i in range(d)])
        return h_next, acc

    acc0 = jax.lax.pcast(jnp.zeros((s, mf), h.dtype), (axis,), to="varying")
    _, acc = jax.lax.fori_loop(0, d, round_body, (h, acc0))
    return acc


def _ring_set2vec(rparams, x, node_mask, node_graph, num_graphs: int,
                  axis: str, *, time_steps: int = 100,
                  batch_softmax: bool = True):
    """Sharded set2set readout (sparse_set2vec semantics): per-node energies
    stay local; the softmax normalizer, attention reads, and LSTM state are
    made GLOBAL with pmax/psum — node states never gather on one device.
    x: (S, w) local shard rows; returns replicated (G, 2w)."""
    from mpnn_tpu.ops.readout import _BIG_NEGATIVE, _lstm_hidden_apply

    width = x.shape[-1]
    dtype = x.dtype
    mprev = jnp.zeros((num_graphs, 2 * width), dtype)
    cprev = jnp.zeros((num_graphs, width), dtype)
    add_mask = (1.0 - node_mask[:, 0]) * _BIG_NEGATIVE

    def step(carry, _):
        mprev, cprev = carry
        m, c = _lstm_hidden_apply(rparams["lstm"], mprev, cprev)
        query = linear_apply(rparams["q_attn"], m)          # (G, width)
        q_per_node = query[jnp.clip(node_graph, 0, num_graphs - 1)]
        energies = linear_apply(
            rparams["e_attn"], jnp.tanh(q_per_node + x))[:, 0] + add_mask
        if batch_softmax:
            emax = jax.lax.pmax(jnp.max(energies), axis)
            z = jnp.exp(energies - emax)
            denom = jax.lax.psum(jnp.sum(z), axis)
            att = z / denom
        else:
            emax_l = jax.ops.segment_max(energies, node_graph,
                                         num_segments=num_graphs + 1)
            emax = jax.lax.pmax(emax_l, axis)
            z = jnp.exp(energies - emax[node_graph])
            denom = jax.lax.psum(
                jax.ops.segment_sum(z, node_graph,
                                    num_segments=num_graphs + 1), axis)
            att = z / denom[node_graph]
        read = jax.lax.psum(
            jax.ops.segment_sum(att[:, None] * x, node_graph,
                                num_segments=num_graphs + 1)[:-1], axis)
        m_out = jnp.concatenate([m, read], axis=1)
        return (m_out, c), None

    (m_final, _), _ = jax.lax.scan(step, (mprev, cprev), None,
                                   length=time_steps)
    return m_final


def make_ring_mpnn_forward(cfg: MPNNConfig, mesh: Mesh, axis: str = "edge",
                           num_graphs: int = None, training: bool = True,
                           edge_impl: str = "ppermute",
                           interpret: bool = False):
    """Returns fwd(params, state, ring_batch) → ((G, out), new_state) with
    everything node-sharded internally. ring_batch from
    parallel.ring.partition_edges_ring (+ 'labels'/'graph_mask' pass-through
    handled by the caller).

    edge_impl: 'ppermute' (XLA ring rounds — the reference oracle) or
    'halo' (the overlapped Pallas halo-exchange kernel,
    kernels/ring_halo.py::make_ring_halo_edge_term — the TPU-mesh
    selection; A-form, so edge_network needs the edge VOCAB bucketed into
    the ring batch: partition_edges_ring emits ring_vids/ring_vrows when
    the packed batch carries edge_vid)."""
    if cfg.message_fn not in ("edge_network", "ggnn") \
            or cfg.readout not in ("graph_level", "set2vec"):
        raise NotImplementedError(
            "ring forward covers edge_network/ggnn messages with "
            "graph_level/set2vec readouts")
    if edge_impl not in ("ppermute", "halo"):
        raise ValueError(edge_impl)
    use_halo = edge_impl == "halo"
    if use_halo:
        from mpnn_tpu.kernels.ring_halo import make_ring_halo_edge_term
        halo_term = make_ring_halo_edge_term(mesh, axis,
                                             interpret=interpret)
    # the ring body uses params['message'][0] for every step and a fixed
    # cat([h, h0]) readout input — reject configs those would silently break
    if not cfg.share_message_weights and cfg.message_steps > 1:
        raise NotImplementedError(
            "ring forward shares one message fn across steps; "
            "share_message_weights=False is not supported")
    if cfg.concat_state_history:
        raise NotImplementedError(
            "ring forward reads out from cat([h, h0]); "
            "concat_state_history is not supported")
    d = mesh.shape[axis]
    nf, mf = cfg.node_features, cfg.message_features

    def local(params, state, node_sh, mask_sh, graph_sh, src_b, dst_b,
              efeats_b, vid_b, vrows, graph_mask):
        # local shapes: node (1,S,nf), mask (1,S,1), graph (1,S),
        # buckets (1,D,Eb,·); vrows/graph_mask replicated
        h0 = node_sh[0] * mask_sh[0]
        mask = mask_sh[0]
        node_graph = graph_sh[0]
        ng = graph_mask.shape[0]
        new_state = dict(state)

        mp = params["message"][0]
        amat_vocab = None
        if cfg.message_fn == "ggnn":
            # efeats_b carries the (D, Eb) int type buckets; A_0 = 0
            type_b = efeats_b[0]
            wg = jnp.concatenate(
                [jnp.zeros((1, mf, nf), mp["adj_w"].dtype), mp["adj_w"]],
                axis=0)
            a0 = None
        elif use_halo:
            # A-form via the edge VOCAB: fold the ≤K distinct rows' tail
            # penultimates into per-vocab matrices (vid 0 = the zero raw
            # row → amat_vocab[0] = 0, the halo kernel's pad convention)
            pen_v, pen0, _ = _edge_penultimates(mp, vrows, cfg)
            pf = pen0.shape[-1]
            wf = mp["final"]["w"].reshape(pf, mf, nf)
            bf = mp["final"]["b"].reshape(mf, nf)
            amat_vocab = jnp.einsum("kp,pmf->kmf", pen_v - pen0, wf,
                                    preferred_element_type=h0.dtype)
            a0 = jnp.einsum("p,pmf->mf", pen0[0], wf) + bf
        else:
            # per-bucket edge-MLP penultimates (local edges only)
            eb_feats = efeats_b[0]
            dd, eb, fe = eb_feats.shape
            pen, pen0, _ = _edge_penultimates(mp, eb_feats.reshape(-1, fe),
                                              cfg)
            ptilde = (pen - pen0).reshape(dd, eb, -1)
            pf = ptilde.shape[-1]
            wf = mp["final"]["w"].reshape(pf, mf, nf)
            bf = mp["final"]["b"].reshape(mf, nf)
            a0 = jnp.einsum("p,pmf->mf", pen0[0], wf) + bf

        ma_bn_state = list(state.get("ma_bn", []))
        bn_state = list(state.get("bn", []))

        h = h0
        for step in range(cfg.message_steps):
            ni = step if cfg.per_step_norms else 0
            msg_src = h0 if cfg.message_input == "initial" else h
            if cfg.message_fn == "ggnn":
                if use_halo:
                    edge_term = halo_term(msg_src, type_b, src_b[0],
                                          dst_b[0], wg)
                else:
                    edge_term = _ring_edge_term_ggnn(msg_src, src_b[0],
                                                     dst_b[0], type_b, wg,
                                                     axis, d)
                msgs = edge_term + mp["message_bias"]
            else:
                if use_halo:
                    edge_term = halo_term(msg_src, vid_b[0], src_b[0],
                                          dst_b[0], amat_vocab)
                else:
                    edge_term = _ring_edge_term(msg_src, src_b[0],
                                                dst_b[0], ptilde, wf,
                                                axis, d)
                # A0 graph correction: global per-graph sums via psum
                s_local = jax.ops.segment_sum(msg_src, node_graph,
                                              num_segments=ng + 1)
                s_glob = jax.lax.psum(s_local, axis)
                msgs = edge_term + s_glob[node_graph] @ a0.T \
                    + mp["message_bias"]
            if cfg.msg_norm == "bn1d":
                msgs, ma_bn_state[ni] = bn1d_apply(
                    params["ma_bn"][ni], ma_bn_state[ni], msgs, mask,
                    training=training, axis_name=axis)
            hidden = h if cfg.update_hidden == "state" else h0
            h = gru_apply(params["gru"], msgs[None], hidden[None],
                          mask[None])[0]
            if cfg.state_norm == "stateless":
                h = mask_batch_norm(h, mask, axis_name=axis)
            elif cfg.state_norm == "bn1d":
                h, bn_state[ni] = bn1d_apply(
                    params["bn"][ni], bn_state[ni], h, mask,
                    training=training, axis_name=axis)

        if ma_bn_state:
            new_state["ma_bn"] = ma_bn_state
        if bn_state:
            new_state["bn"] = bn_state

        x = jnp.concatenate([h, h0], axis=-1)
        if cfg.readout == "set2vec":
            out = _ring_set2vec(params["readout"], x, mask, node_graph, ng,
                                axis, time_steps=cfg.set2vec_steps,
                                batch_softmax=cfg.set2vec_batch_softmax)
        else:
            x = x * mask
            gated = jax.nn.softmax(
                linear_apply(params["readout"]["i"], x), axis=-1) \
                * linear_apply(params["readout"]["j"], x) * mask
            out_local = jax.ops.segment_sum(gated, node_graph,
                                            num_segments=ng + 1)[:-1]
            out = jax.lax.psum(out_local, axis)
        return out, new_state

    def fwd(params, state, ring_batch, graph_mask):
        if use_halo and cfg.message_fn == "edge_network" \
                and "ring_vids" not in ring_batch:
            raise ValueError(
                "edge_impl='halo' needs the edge VOCAB bucketed into the "
                "ring batch — collate with attach_edge_vocab before "
                "partition_edges_ring (ring_vids/ring_vrows)")
        sm = shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis),
                      P(axis), P(axis), P(axis), P(), P()),
            out_specs=(P(), P()),
            # the halo kernel's pallas outputs don't declare their mesh
            # variance (same rule as kernels/ring_halo.py)
            check_vma=not use_halo,
        )
        feats = ring_batch["ring_etypes"] if cfg.message_fn == "ggnn" \
            else ring_batch["ring_efeats"]
        dd = ring_batch["ring_src"].shape[0]
        vid_b = ring_batch.get(
            "ring_vids",
            jnp.zeros((dd, dd, 1), jnp.int32))      # dummy when unused
        vrows = ring_batch.get(
            "ring_vrows",
            jnp.zeros((1, cfg.edge_features), jnp.float32))
        return sm(params, state,
                  ring_batch["node_feats_sh"], ring_batch["node_mask_sh"],
                  ring_batch["node_graph_sh"], ring_batch["ring_src"],
                  ring_batch["ring_dst"], feats, vid_b, vrows, graph_mask)

    return fwd
