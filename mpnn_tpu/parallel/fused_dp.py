"""Data-parallel training over the WHOLE-STEP fused kernel.

The single-chip flagship step is one forward + one backward `pallas_call`
(kernels/fused_step.py). This module scales that megakernel across a
device mesh the scaling-book way: each device holds its own PACKED SHARD
(its own graphs — a private flat node/edge axis packed to the same caps),
runs the fused kernel locally under `shard_map`, and the only collectives
are a gradient/loss `psum` and the BN-statistic combine. Per-device work
is identical to the measured single-chip kernel, so DP scaling rides ICI
with one all-reduce per step.

Semantics (deliberate, tested in tests/test_fused_dp.py):

  * the loss is the GLOBAL graph-count-weighted mean
        L = sum_i sse_i / sum_i count_i
    and the psum'd gradients are exactly dL/dp (per-shard grads weighted
    by count_i / total, then summed);
  * in-step BN normalization uses LOCAL shard statistics (sync-free BN —
    the torch-DDP default; the XLA sparse DP path in data_parallel.py
    remains the exact cross-replica-BN option);
  * running-stat EMAs are updated with the EXACT GLOBAL batch moments:
    local (mean, var) pairs combine through the count-weighted E[x]/E[x²]
    identity, so serving behavior does not depend on the shard split.

Reference scope: the reference has no distributed training at all
(SURVEY.md §2.6 — `pre_process/utils.py:6-13` is its entire device
story); this is greenfield TPU-native capability.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mpnn_tpu.models.config import MPNNConfig
from mpnn_tpu.models.fused_train import (_att_readout, _bn_param_or_dummy,
                                         _bn_params_list_or_dummy,
                                         _build_a_form,
                                         _build_a_form_psteps,
                                         _build_att_form,
                                         _build_att_form_steps, _ema,
                                         _fold_emas, _input_transforms,
                                         _psteps_shape,
                                         fused_eval_eligible,
                                         fused_mpnn_eval,
                                         fused_step_eligible,
                                         make_fused_eval_for_batch,
                                         make_fused_step_for_batch)

_STATIC_KEYS = ("fs_block_edges", "fs_window", "fs_node_window")


# ---------------------------------------------------------------------------
# host-side superbatch assembly
# ---------------------------------------------------------------------------

def plan_shard_windows(shards: List[Dict], block_edges: int = 512,
                       size_bucket: int = 128) -> Optional[List[Dict]]:
    """Re-plan every shard's fused-step windows with ONE common forced
    (window, node_window) — the elementwise max of the per-shard needs —
    so the stacked superbatch compiles a single kernel shape. Returns the
    re-planned shards, or None when any shard's locality premise fails
    (caller falls back to the unfused DP path)."""
    from mpnn_tpu.kernels.fused_step import attach_fused_plan, plan_fused_step
    plans = []
    for b in shards:
        p = plan_fused_step(
            np.asarray(b["edge_src"]), np.asarray(b["edge_dst"]),
            np.asarray(b["edge_mask"]), np.asarray(b["node_graph"]),
            int(np.asarray(b["node_feats"]).shape[0]),
            int(np.asarray(b["graph_mask"]).shape[0]),
            block_edges, size_bucket=size_bucket)
        if p is None:
            return None
        plans.append(p)
    w = max(p.window for p in plans)
    nw = max(p.node_window for p in plans)
    out = []
    for b in shards:
        nb = attach_fused_plan(dict(b), block_edges=block_edges,
                               window=w, node_window=nw)
        if "fs_win" not in nb:
            return None
        out.append(nb)
    return out


def stack_shards(shards: List[Dict]) -> Dict:
    """Stack per-device packed shards on a leading device axis. All shards
    must be packed to identical caps (GraphLoader's fixed_packed_caps
    guarantee) and carry identical static plan sizes."""
    sup = {}
    for k, v0 in shards[0].items():
        if np.isscalar(v0) or not hasattr(v0, "shape"):
            if any(b[k] != v0 for b in shards[1:]):
                raise ValueError(f"shards disagree on static '{k}'")
            sup[k] = v0
            continue
        vs = [np.asarray(b[k]) for b in shards]
        if any(v.shape != vs[0].shape for v in vs[1:]):
            raise ValueError(f"shards disagree on '{k}' shape")
        sup[k] = np.stack(vs)
    return sup


def split_statics(superbatch: Dict):
    """(arrays-only superbatch, statics dict) — jit sees only arrays;
    every scalar (fs_* plan sizes, num_graphs, ...) is static."""
    arrays = {k: v for k, v in superbatch.items()
              if hasattr(v, "shape") and not np.isscalar(v)}
    statics = {k: v for k, v in superbatch.items() if k not in arrays}
    return arrays, statics


def shard0_view(superbatch: Dict) -> Dict:
    """One shard's view (device 0) with statics inline — the shape
    template make_fused_step_for_batch builds the kernel from."""
    return {k: (v if (np.isscalar(v) or not hasattr(v, "shape")) else v[0])
            for k, v in superbatch.items()}


# ---------------------------------------------------------------------------
# the sharded train step
# ---------------------------------------------------------------------------

def _family_of(cfg: MPNNConfig) -> str:
    if cfg.message_fn == "att_edge_network":
        return "att"
    if cfg.message_fn == "bilinear":
        return "bilinear"
    return "psteps" if _psteps_shape(cfg) else "shared"


def make_fused_dp_train_step(cfg: MPNNConfig, tx, mesh: Mesh,
                             example_superbatch: Dict, *,
                             axis: str = "data", interpret: bool = False):
    """Build the DP train step over the whole-step fused kernel — ANY
    fused family: the shared-weights kernel (flagship/GGNN/basic shapes),
    the per-step-parameter kernel (encoded family — per-step BN stats get
    the same count-weighted global combine), and the att kernels
    (collapsed or T-step; no in-recurrence stats). The encoded family's
    input encoders + input BN run in XLA with exact CROSS-REPLICA stats
    (bn1d_apply's axis_name psum) around the local kernels.

    `example_superbatch` fixes the compiled shapes (stack_shards output,
    arrays of shape (n_devices, ...)). The returned step takes
    (params, state, opt_state, superbatch_arrays) — strip statics with
    split_statics — and returns (loss, params, new_state, opt_state, out)
    with `out` the (n_devices * G_shard, output_dim) global readout.
    Loss = the global graph-count-weighted masked MSE on the kernel's
    readout (output_norm configs are out of scope — the obn affine would
    need its own cross-replica story)."""
    shard0 = shard0_view(example_superbatch)
    if not fused_step_eligible(cfg, shard0, training=True):
        raise ValueError("config/batch not fused-step eligible")
    if cfg.output_norm:
        raise ValueError("fused DP does not cover output_norm configs")
    fused_op = make_fused_step_for_batch(cfg, shard0, interpret=interpret)
    family = _family_of(cfg)
    nf, mf, T = cfg.node_features, cfg.message_features, cfg.message_steps

    def local_step(params, state, batch):
        b = {k: v[0] for k, v in batch.items()}   # this device's shard
        labels = b.pop("labels")
        cnt = b["graph_mask"].sum()
        total = jax.lax.psum(cnt, axis)

        def lf(p):
            h0, efeats, in_upd = _input_transforms(
                p, state, cfg, b, training=True, axis_name=axis)
            if family == "shared":
                amat, a0, vid = _build_a_form(p, cfg, b,
                                              edge_feats=efeats)
                loss, out, ma_stats, step_stats = fused_op(
                    amat, a0, p["message"][0]["message_bias"], h0,
                    b["node_mask"], b["node_graph"], p["gru"],
                    _bn_param_or_dummy(p, "ma_bn", mf),
                    _bn_param_or_dummy(p, "bn", nf),
                    p["readout"], labels,
                    b["graph_mask"], vid, b["edge_src"], b["edge_dst"],
                    b["fs_win"], b["fs_ns"])
                stats = (ma_stats, tuple(step_stats))
            elif family == "psteps":
                amat, a0, mbias, vid = _build_a_form_psteps(
                    p, cfg, b, efeats)
                loss, out, ma_stats, bn_stats = fused_op(
                    amat, a0, mbias, h0, b["node_mask"],
                    b["node_graph"], p["gru"],
                    _bn_params_list_or_dummy(p, "ma_bn", mf, T),
                    _bn_params_list_or_dummy(p, "bn", nf, T),
                    p["readout"], labels, b["graph_mask"], vid,
                    b["edge_src"], b["edge_dst"], b["fs_win"],
                    b["fs_ns"])
                stats = (tuple(ma_stats), tuple(bn_stats))
            elif family == "bilinear":
                # bilinear family: kernel messages+GRU, concat-history
                # readout in XLA (no norms → no cross-device stats)
                from mpnn_tpu.models.fused_train import fused_bilinear_out
                out, _ = fused_bilinear_out(p, state, cfg, b, fused_op)
                per = ((out - labels[:, None]) ** 2) \
                    * b["graph_mask"][:, None]
                loss = per.sum() / cnt
                stats = ()
            else:
                ops = fused_op if isinstance(fused_op, dict) \
                    else {"att": fused_op, "s2v": None}
                if cfg.update_hidden == "state":
                    aprime, a0, qv, q0, wh = _build_att_form_steps(
                        p, cfg, b, efeats)
                else:
                    aprime, a0, qv, q0, wh = _build_att_form(
                        p, cfg, b, efeats)
                h = ops["att"](aprime, a0, qv, q0, wh, h0,
                               b["node_mask"], b["node_graph"],
                               p["gru"], b["edge_vid"], b["edge_src"],
                               b["edge_dst"], b["fs_win"], b["fs_ns"])
                if ops.get("s2v") is not None:
                    x = jnp.concatenate([h, h0], axis=-1)
                    out = ops["s2v"](p["readout"], x, b["node_mask"],
                                     b["node_graph"], b["fs_ns"])
                else:
                    out = _att_readout(p, cfg, h, h0, b)
                per = ((out - labels[:, None]) ** 2) \
                    * b["graph_mask"][:, None]
                loss = per.sum() / cnt
                stats = ()
            return loss * (cnt / total), (out, stats, in_upd)

        (wloss, (out, stats, in_upd)), grads = jax.value_and_grad(
            lf, has_aux=True)(params)
        loss = jax.lax.psum(wloss, axis)
        grads = jax.lax.psum(grads, axis)

        # exact global batch moments for the running-stat EMAs: combine
        # local (mean, var) via count-weighted E[x] / E[x²]
        nc = b["node_mask"].sum()
        nt = jax.lax.psum(nc, axis)

        def comb(s):
            m, v = s
            gm = jax.lax.psum(m * nc, axis) / nt
            ex2 = jax.lax.psum((v + m * m) * nc, axis) / nt
            return gm, ex2 - gm * gm

        if family == "shared":
            ma_stats, step_stats = stats
            stats_g = (comb(ma_stats), tuple(comb(s) for s in step_stats))
        elif family == "psteps":
            ma_l, bn_l = stats
            stats_g = (tuple(comb(s) for s in ma_l),
                       tuple(comb(s) for s in bn_l))
        else:
            stats_g = ()
        return loss, grads, out, stats_g, in_upd

    sharded, repl = P(axis), P()
    # check_vma=False: pallas_call's out_shapes carry no varying-across-
    # mesh annotation, so the static replication checker cannot see that
    # the psum'd outputs are replicated (they are — by construction)
    sm = shard_map(local_step, mesh=mesh,
                   in_specs=(repl, repl, sharded),
                   out_specs=(repl, repl, sharded, repl, repl),
                   check_vma=False)

    @jax.jit
    def step(params, state, opt_state, superbatch):
        loss, grads, out, stats_g, in_upd = sm(params, state, superbatch)
        if family == "shared" and stats_g:
            ma_g, st_g = stats_g
            new_state = _fold_emas(state, cfg, ma_g, list(st_g))
        elif family == "psteps":
            ma_g, bn_g = stats_g
            new_state = dict(state)
            if cfg.msg_norm == "bn1d":
                new_state["ma_bn"] = [_ema(s, st) for s, st
                                      in zip(state["ma_bn"], ma_g)]
            if cfg.state_norm == "bn1d":
                new_state["bn"] = [_ema(s, st) for s, st
                                   in zip(state["bn"], bn_g)]
        else:
            new_state = dict(state)
        new_state.update(in_upd)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return loss, params, new_state, opt_state, out

    return step


def make_fused_dp_eval_step(cfg: MPNNConfig, mesh: Mesh,
                            example_superbatch: Dict, *,
                            axis: str = "data", interpret: bool = False):
    """Sharded SERVING step: each device runs the whole-step INFERENCE
    kernel on its own packed shard (eval-mode BN = running-stat affines —
    no cross-device state at all, so DP serving is embarrassingly
    parallel over ICI-free shards). Returns step(params, state,
    superbatch_arrays) → out (n_devices · G_shard, output_dim)."""
    shard0 = shard0_view(example_superbatch)
    if not fused_eval_eligible(cfg, shard0):
        raise ValueError("config/batch not fused-eval eligible")
    eval_op = make_fused_eval_for_batch(cfg, shard0, interpret=interpret)

    def local(params, state, batch):
        b = {k: v[0] for k, v in batch.items()}
        b.pop("labels", None)
        return fused_mpnn_eval(params, state, cfg, b, eval_op)

    sm = shard_map(local, mesh=mesh,
                   in_specs=(P(), P(), P(axis)),
                   out_specs=P(axis), check_vma=False)

    @jax.jit
    def step(params, state, superbatch):
        return sm(params, state, superbatch)

    return step


def put_superbatch(mesh: Mesh, superbatch: Dict, *,
                   axis: str = "data") -> Dict:
    """Place a stacked superbatch: device axis sharded over `axis`."""
    sh = NamedSharding(mesh, P(axis))
    return {k: jax.device_put(jnp.asarray(v), sh)
            for k, v in superbatch.items()}
