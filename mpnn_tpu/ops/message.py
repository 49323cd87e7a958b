"""Message functions M_t(h_v, h_w, e_vw) — dense (padded B×N×N) forms.

All four reference message families are re-derived as pure JAX functions:

  * edge_network        — edge-conditioned matvec, fused with neighbor-sum
                          aggregation (returns B×N×mf, already summed).
                          Reference: mpnn_functions/message/edge_network.py:7-51.
  * att_edge_network    — attention-gated per-pair messages (returns B×N×N×mf).
                          Reference: mpnn_functions/message/att_edge_network.py:6-31.
  * bilinear_edge_network — parameter-free bilinear score h_vᵀ W(e) h_w.
                          Reference: mpnn_functions/message/bilinear_edge_network.py:6-38.
  * ggnn                — per-edge-type weight tensor, fused neighbor-sum.
                          Reference: mpnn_functions/message/ggnn_msg_pass.py:4-31.

TPU-first design notes (NOT a translation of the reference):
  - The reference materializes a (B, N·mf, N·nf) block matrix and runs one
    bmm. We never materialize the (B,N,N,mf,nf) edge-matrix tensor for the
    fused path; instead the final edge-MLP layer (pf → mf·nf) is algebraically
    re-associated so the neighbor sum contracts over the *penultimate*
    features:  Σ_w A(e_vw)h_w = einsum(P[b,v,w,p], Wf[p,m,n], h[b,w,n]) + ...
    This keeps everything as large dense matmuls on the MXU and drops peak
    memory from O(B·N²·mf·nf) to O(B·N²·pf).
  - The quirky reference edge-MLP (width-squaring head, then a 50× repeat of a
    single weight-SHARED square layer, then a final projection —
    edge_network.py:16-21) is reproduced with a lax.scan over the shared layer.
    `tail_repeats` is configurable; 50 matches the reference exactly.
  - "Bias leakage": padded / non-bonded pairs have all-zero edge features, but
    the edge MLP has biases, so non-edges contribute A(0)·h_w to the fused sum
    (documented in SURVEY.md §2.3). The dense path reproduces this naturally;
    the sparse path (kernels/) reproduces it exactly via the A0 decomposition
    m_v = Σ_edges (A(e)−A0) h_w + A0 · Σ_w h_w.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from mpnn_tpu.ops.linear import linear_init, linear_apply


# ---------------------------------------------------------------------------
# Edge-MLP (shared by edge_network / att_edge_network)
# ---------------------------------------------------------------------------

def edge_mlp_head_dims(ef: int, nf: int, mf: int):
    """Width-squaring schedule: while in² < nf·mf, append Linear(in, in²).
    Returns the list of (in, out) dims for the head and the penultimate width."""
    dims = []
    in_layer = ef
    while in_layer ** 2 < nf * mf:
        dims.append((in_layer, in_layer ** 2))
        in_layer = in_layer ** 2
    return dims, in_layer


def edge_network_init(key, nf: int, ef: int, mf: int, tail_repeats: int = 50,
                      dtype=jnp.float32, init: str = "torch_default"):
    """Parameters for the EdgeNetwork edge-MLP + message bias.

    Layers: [Linear(in, in²)+act]* , 1 weight-shared Linear(pf, pf, no bias)
    applied `tail_repeats` times with activation, Linear(pf, nf·mf).

    init='kaiming_relu' reproduces the lipo driver's
    model.apply(init_weights) pass (lipo_basic_model.py:88-107: kaiming
    weights + zero biases on EVERY Linear) — load-bearing for training
    dynamics: with torch-default init the ×50 weight-shared relu tail has
    spectral radius < 1 and collapses the penultimate features."""
    head_dims, pf = edge_mlp_head_dims(ef, nf, mf)
    keys = jax.random.split(key, len(head_dims) + 2)
    head = [linear_init(keys[i], din, dout, bias=True, dtype=dtype,
                        init=init)
            for i, (din, dout) in enumerate(head_dims)]
    shared = linear_init(keys[-2], pf, pf, bias=False, dtype=dtype,
                         init=init)
    final = linear_init(keys[-1], pf, nf * mf, bias=True, dtype=dtype,
                        init=init)
    return {
        "head": head,
        "shared": shared,
        "final": final,
        "message_bias": jnp.zeros((mf,), dtype),
    }


def _edge_mlp_penultimate(params, e, act, tail_repeats: int):
    """Run the edge-MLP up to (but not including) the final projection.
    e: (..., ef) → (..., pf)."""
    x = e
    for layer in params["head"]:
        x = act(linear_apply(layer, x))
    if tail_repeats > 0:
        w = params["shared"]["w"]

        def body(x, _):
            return act(x @ w), None

        x, _ = jax.lax.scan(body, x, None, length=tail_repeats)
    return x


def edge_network_precompute(params, bfm, *, nf: int, mf: int,
                            act=jax.nn.relu, tail_repeats: int = 50):
    """Precompute per-pair penultimate features P = (B,N,N,pf).

    The reference caches its block matrix across message steps
    (edge_network.py:43-44 `reuse_graph_tensors`); we cache P once per
    forward — under jit this is hoisted out of the message-step scan."""
    return _edge_mlp_penultimate(params, bfm, act, tail_repeats)


def edge_network_fused(params, pen, h, *, nf: int, mf: int):
    """Fused message+aggregate: m[b,v,m] = Σ_w A(e_vw)·h_w + message_bias.

    A(e) = reshape(Wf·p + bf, (mf, nf)); re-associated so the big contraction
    is  T[b,w,p,m] = Σ_n Wf[p,m,n]·h[b,w,n]   (B·N·pf·mf·nf flops, MXU)
        S[b,v,m]   = Σ_{w,p} P[b,v,w,p]·T[b,w,p,m]  (B·N²·pf·mf flops, MXU)
    plus the final-bias term Bf[m,n]·Σ_w h[b,w,n]."""
    B, N, nfeat = h.shape
    pf = pen.shape[-1]
    wf = params["final"]["w"].reshape(pf, mf, nf)
    bf = params["final"]["b"].reshape(mf, nf)
    t = jnp.einsum("pmn,bwn->bwpm", wf, h,
                   preferred_element_type=h.dtype)
    s = jnp.einsum("bvwp,bwpm->bvm", pen, t,
                   preferred_element_type=h.dtype)
    hsum = h.sum(axis=1)                      # (B, nf)
    s = s + (hsum @ bf.T)[:, None, :]         # Bf · Σ_w h_w, broadcast over v
    return s + params["message_bias"]


def edge_network_pairwise_matrices(params, pen, *, nf: int, mf: int):
    """Materialize A(e_vw) = (B,N,N,mf,nf) — used only by the attention
    variant, whose per-pair gating prevents the fused re-association."""
    a = linear_apply(params["final"], pen)
    return a.reshape(pen.shape[:-1] + (mf, nf))


# ---------------------------------------------------------------------------
# AttEdgeNetwork — per-pair messages with learned attention gate
# ---------------------------------------------------------------------------

def att_edge_network_init(key, nf: int, ef: int, mf: int, tail_repeats: int = 50,
                          dtype=jnp.float32, init: str = "torch_default"):
    """Same edge-MLP stack as edge_network_init (the ×50 weight-shared
    tail included, so `init` is equally load-bearing here) plus the
    attention Linear([h ‖ e]) head."""
    k1, k2 = jax.random.split(key)
    p = edge_network_init(k1, nf, ef, mf, tail_repeats, dtype, init=init)
    p["attn"] = linear_init(k2, nf + ef, nf, bias=True, dtype=dtype)
    return p


def att_edge_network_apply(params, pen, h, bfm, *, nf: int, mf: int,
                           attn_act=None):
    """Per-pair messages (B,N,N,mf):
      attn_w[b,v,w,:] = softmax(Linear([h_v ‖ e_vw]))       (softmax over feat)
      g[b,v,w,:]      = attn_w ⊙ h_w
      msg[b,v,w,:]    = A(e_vw) · g[b,v,w,:]
    Reference: att_edge_network.py:13-31 (note: h_v is broadcast along the
    *second* node axis via unsqueeze(-2).expand, and h_w via unsqueeze(1))."""
    B, N, _ = h.shape
    if attn_act is None:
        attn_act = partial(jax.nn.softmax, axis=-1)
    # cat([h_v expanded over w, e_vw])  → (B,N,N,nf+ef)
    hv = jnp.broadcast_to(h[:, :, None, :], (B, N, N, nf))
    cat = jnp.concatenate([hv, bfm], axis=-1)
    attn_w = attn_act(linear_apply(params["attn"], cat))     # (B,N,N,nf)
    g = attn_w * h[:, None, :, :]                            # gate h_w
    a = edge_network_pairwise_matrices(params, pen, nf=nf, mf=mf)
    return jnp.einsum("bvwmn,bvwn->bvwm", a, g,
                      preferred_element_type=h.dtype)


# ---------------------------------------------------------------------------
# Bilinear edge network (no parameters)
# ---------------------------------------------------------------------------

def bilinear_edge_network_apply(h, bfm, *, nf: int):
    """Parameter-free bilinear per-pair message, mirroring the reference's
    literal reshape/matmul chain (bilinear_edge_network.py:26-38):

      x = h_w ᵀ · view(bfm, (B,N,N,nf,ef/nf))     → (B,N,N,1,ef/nf)
      y = view(x, (B,N,N,nf,-1))                   (requires nf | ef/nf·1)
      out = y ᵀ?·h_v …                             → squeezed

    The chain is only shape-coherent when ef == nf³ (then the output is
    (B,N,N,nf)); we assert that and implement the equivalent einsum:
      out[b,v,w,m] = Σ_i h_v[i] · ( Σ_n h_w[n] · W[b,v,w,n, i, m] )
    where W = bfm viewed as (B,N,N,nf,nf,nf) with the first matmul
    contracting the leading nf axis and the second the middle axis."""
    B, N, _ = h.shape
    ef = bfm.shape[-1]
    assert ef == nf ** 3, (
        f"bilinear message requires ef == nf^3 for shape coherence "
        f"(got ef={ef}, nf={nf}); see SURVEY.md §2.3")
    w = bfm.reshape(B, N, N, nf, nf, nf)
    # first matmul: h_w contracts the FIRST nf axis (h_w indexed by axis 2)
    x = jnp.einsum("bwn,bvwnij->bvwij", h, w)
    # second matmul: h_v contracts the LAST axis; output keeps the middle one
    out = jnp.einsum("bvj,bvwij->bvwi", h, x)
    return out


# ---------------------------------------------------------------------------
# GGNN — per-edge-type weight matrices
# ---------------------------------------------------------------------------

def ggnn_init(key, nf: int, ef: int, mf: int, dtype=jnp.float32):
    """adj_w: (ef, mf, nf), kaiming-uniform (relu); type 0 is pinned to the
    zero matrix at apply time ("no bond"). Reference: ggnn_msg_pass.py:10-14."""
    fan_in = nf  # contraction dim of each (mf, nf) matrix
    bound = math.sqrt(6.0 / fan_in)
    adj_w = jax.random.uniform(key, (ef, mf, nf), dtype, -bound, bound)
    return {"adj_w": adj_w, "message_bias": jnp.zeros((mf,), dtype)}


def ggnn_fused(params, bfm_types, h, *, nf: int, mf: int):
    """Fused message+aggregate for integer edge types:
      m[b,v,:] = Σ_w A_{type(v,w)} · h_w + bias,  A_0 = 0.

    bfm_types: (B,N,N) int. Implemented as a one-hot contraction so the work
    is two dense matmuls (types are few) rather than a gather of matrices."""
    ef = params["adj_w"].shape[0]
    w = jnp.concatenate([jnp.zeros((1, mf, nf), params["adj_w"].dtype),
                         params["adj_w"]], axis=0)          # (ef+1, mf, nf)
    onehot = jax.nn.one_hot(bfm_types, ef + 1, dtype=h.dtype)  # (B,N,N,T)
    t = jnp.einsum("tmn,bwn->btwm", w, h,
                   preferred_element_type=h.dtype)          # (B,T,N,mf)
    s = jnp.einsum("bvwt,btwm->bvm", onehot, t,
                   preferred_element_type=h.dtype)
    return s + params["message_bias"]
