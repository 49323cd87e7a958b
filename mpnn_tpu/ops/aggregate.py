"""Message aggregators: per-pair messages (B,N,N,mf) → per-node (B,N,mf).

Dense forms of the three reference aggregators
(mpnn_functions/message_aggregators/*.py) plus the sparse segment-sum
aggregation used by the COO/packed path (the TPU-idiomatic decomposition:
per-edge message op + separate segment reduction — see SURVEY.md §2.4
"contract hazard" for why the reference's fused/unfused mix is made explicit
here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mpnn_tpu.ops.linear import linear_init, linear_apply


def adj_agg(messages, adj):
    """Σ_w msg[b,v,w,:]·adj[b,v,w] — adjacency-masked sum.
    Reference: adjacent_message_agg.py:18."""
    return jnp.einsum("bvwm,bvw->bvm", messages, adj,
                      preferred_element_type=messages.dtype)


def wadj_agg(messages, adj):
    """Soft row-normalized adjacency: weights = softmax(adj, axis=-1).
    (Note: the softmax runs over raw 0/1 adjacency values, padded columns
    included — a reference quirk kept for parity.)
    Reference: weighted_adjacent_message_agg.py:20."""
    w = jax.nn.softmax(adj, axis=-1)
    return jnp.einsum("bvwm,bvw->bvm", messages, w,
                      preferred_element_type=messages.dtype)


def att_agg_init(key, adj_dim: int, dtype=jnp.float32):
    """Learned scalar attention over adjacency rows: Linear(adj→1)+softmax.
    The Linear acts on adj.unsqueeze(-1), i.e. a 1-feature input.
    Reference: attention_message_agg.py:8-24."""
    return {"att": linear_init(key, 1, 1, bias=True, dtype=dtype)}


def att_agg(params, messages, adj, attn_act=None):
    if attn_act is None:
        attn_act = lambda x: jax.nn.softmax(x, axis=-1)
    # Linear over the trailing singleton feature of adj, then softmax over
    # the last axis of the (B,N,N,1) output — which is the singleton axis,
    # making the softmax a constant 1.0. This mirrors the reference exactly
    # (nn.Softmax(dim=-1) over a size-1 axis); a documented quirk.
    logits = linear_apply(params["att"], adj[..., None])     # (B,N,N,1)
    w = attn_act(logits)
    return (messages * w).sum(axis=-2)


def segment_agg(edge_messages, edge_dst, num_nodes: int, edge_weight=None):
    """Sparse aggregation: scatter-add per-edge messages to destination nodes.

    edge_messages: (E, mf); edge_dst: (E,) int32 into the packed node axis;
    padded edges must point at a dummy node slot (num_nodes-1 by convention)
    with zero messages/weights. XLA lowers segment_sum to an efficient sorted
    scatter on TPU; the Pallas kernel in kernels/spmm.py is the tuned variant.
    """
    if edge_weight is not None:
        edge_messages = edge_messages * edge_weight[:, None]
    return jax.ops.segment_sum(edge_messages, edge_dst, num_segments=num_nodes)
