"""Training loops: jitted train step + epoch driver with eval, plateau LR,
JSONL metrics, and checkpoint/resume.

Mirrors the reference driver template (SURVEY.md §2.5): seed 317, Adam,
epoch loop, per-epoch eval with sklearn-style metrics, F1-gated checkpoints
(test.py:122-138) — plus the pieces the reference lacks: resume, bucketed
static-shape batching, optional data-parallel sharding (parallel/).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mpnn_tpu.graphs.dataloader import GraphLoader
from mpnn_tpu.models.network import NetworkConfig, network_apply, network_init
from mpnn_tpu.train import metrics as M
from mpnn_tpu.train.checkpoint import (
    latest_checkpoint, load_checkpoint, save_checkpoint,
)
from mpnn_tpu.train.logging import MetricLogger
from mpnn_tpu.train.optim import (
    ReduceLROnPlateau, adam, get_learning_rate, set_learning_rate,
)


@dataclasses.dataclass
class TrainConfig:
    epochs: int = 100
    batch_size: int = 16
    learning_rate: float = 1e-3
    weight_decay: float = 0.0
    loss: str = "ce"                 # ce | mse | ecfp_mse
    packed: bool = False             # sparse packed-COO path (fast on TPU)
    compute_dtype: str = "float32"   # float32 | bfloat16 (mixed precision:
                                     # bf16 activations, f32 master params)
    seed: int = 317
    plateau: bool = False            # ReduceLROnPlateau on val loss
    metric_average: str = "weighted"
    ckpt_dir: Optional[str] = None
    ckpt_every: int = 1
    ckpt_f1_gate: Optional[float] = None   # reference F1>0.78/0.8 gating
    early_stop_loss: Optional[float] = None  # test_adv.py:96-98 (<0.02)
    log_path: Optional[str] = None
    shuffle: bool = True
    spmm: str = "xla"                # packed message-step SpMM backend:
                                     # xla | kernel (Pallas, TPU) |
                                     # kernel_interpret (CPU testing)
    fuse_recurrence: bool = False    # fuse the BN→GRU→BN step chain into
                                     # one Pallas kernel (flagship-shaped
                                     # configs only; kernels/recurrence.py)
    fuse_step: bool = False          # whole-step fused kernel (messages →
                                     # loss in one fwd pallas_call +
                                     # 3-kernel bwd; kernels/fused_step.py).
                                     # Bare-MPNN mse configs run the loss
                                     # in-kernel; wrapper/head configs
                                     # (e.g. the real lipo driver) run the
                                     # MPNN core fused with head+loss in
                                     # XLA. Falls back silently when the
                                     # MPNN config/batch is ineligible.
    handle_preemption: bool = True   # SIGTERM → checkpoint + clean exit
                                     # (resume picks the run back up; the
                                     # reference loses preempted runs —
                                     # SURVEY.md §5 failure detection)


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------

def graph_label_sums(nl, ng, batch, n_graphs: int, dtype,
                     node_window: int | None = None):
    """Per-graph sums of node-space labels: s1[g, b] = Σ_{v∈g} nl[v, b].

    The XLA scatter form (segment_sum over a (nodes, 16384) matrix) is
    row-serialized on TPU — measured 9.25 ms at batch 1024. When the
    batch carries the fused-step window plan AND the caller supplies the
    plan's STATIC node_window (it is traced inside jit, so it must be
    threaded from step-creation time), each 128-graph block's nodes lie
    inside [fs_ns[j], fs_ns[j]+node_window), so s1 becomes gb
    membership-one-hot MATMULS over those windows — measured 0.77 ms for
    the identical result (scripts/probe_ecfp_s1.py). Padded nodes carry
    node_graph == n_graphs and zeroed labels, so they drop out of both
    forms."""
    if node_window is not None and "fs_ns" in batch:
        n = nl.shape[0]
        nw = min(int(node_window), n)
        ns_arr = batch["fs_ns"]
        gb = -(-n_graphs // GRAPH_LABEL_BLOCK)

        def block(j, lo, rows):
            ns = jnp.minimum(ns_arr[j].astype(jnp.int32), n - nw)
            ngw = jax.lax.dynamic_slice(ng, (ns,), (nw,))
            yw = jax.lax.dynamic_slice(
                nl, (ns, 0), (nw, nl.shape[1])).astype(dtype)
            og = (lo + jnp.arange(rows, dtype=ngw.dtype)[:, None]
                  == ngw[None, :]).astype(dtype)   # (rows, nw)
            return og @ yw

        if gb <= 16:
            # unrolled: XLA fuses/overlaps the per-window matmuls — the
            # measured-fast form at batch ≤ 2048 (a lax.scan version
            # SERIALIZES them: 0.798 → 1.864 ms at batch 1024, measured)
            parts = []
            for j in range(gb):
                lo = j * GRAPH_LABEL_BLOCK
                parts.append(block(j, lo,
                                   min(GRAPH_LABEL_BLOCK, n_graphs - lo)))
            return jnp.concatenate(parts, axis=0)
        # gb > 16: ONE window per lax.scan iteration — the fully unrolled
        # form put gb copies of a 16384-wide matmul (+ transposes) in the
        # batch-4096 ecfp train program and wedged the remote compile
        # past its request timeout. Both scan granularities were
        # MEASURED at batch 4096: one window/iteration 7.447 ms/step,
        # an 8-window chunked body 10.562 — the serialized form wins
        # (the wide matmuls already saturate HBM; chunking only added
        # concat copies), so it stays. Rows past n_graphs in the last
        # block match no node (all-zero one-hot) and are sliced off.

        def body(_, j):
            return 0, block(j, j * GRAPH_LABEL_BLOCK, GRAPH_LABEL_BLOCK)

        _, parts = jax.lax.scan(body, 0, jnp.arange(gb))
        return parts.reshape(gb * GRAPH_LABEL_BLOCK,
                             nl.shape[1])[:n_graphs]
    return jax.ops.segment_sum(nl.astype(dtype), ng,
                               num_segments=n_graphs,
                               indices_are_sorted=True)


GRAPH_LABEL_BLOCK = 128      # the fused-step plan's graph-block size


def make_loss_fn(net_cfg: NetworkConfig, kind: str,
                 spmm_vocab_fn=None, sddmm_fn=None, recurrence_fn=None,
                 fused_op=None, fused_inkernel_loss: bool = False,
                 eval_op=None, ecfp_node_window: int | None = None):
    def loss_fn(params, state, batch, training: bool):
        packed = "node_feats" in batch
        if packed and training and fused_op is not None \
                and fused_inkernel_loss:
            # whole-step fused kernel (kernels/fused_step.py): the bare
            # MPNN + masked MSE in one fwd pallas_call; eligibility is
            # checked by the caller (train() gates on bare-network shape)
            from mpnn_tpu.models.fused_train import fused_flagship_loss
            loss, out, mpnn_state = fused_flagship_loss(
                params["mpnn"], state["mpnn"], net_cfg.mpnn, batch,
                batch["labels"], fused_op)
            new_state = dict(state)
            new_state["mpnn"] = mpnn_state
            return loss, (out, new_state)
        if packed:
            from mpnn_tpu.models.network import network_apply_packed
            b = {k: v for k, v in batch.items() if k != "num_graphs"}
            out, new_state = network_apply_packed(
                params, state, net_cfg, b, training=training,
                spmm_vocab_fn=spmm_vocab_fn, sddmm_fn=sddmm_fn,
                recurrence_fn=recurrence_fn if training else None,
                fused_op=fused_op if training else None,
                eval_op=eval_op if not training else None)
            gm = batch["graph_mask"]
        else:
            out, new_state = network_apply(params, state, net_cfg, batch,
                                           training=training)
            gm = None
        labels = batch["labels"]
        if kind == "ce":
            per = optax.softmax_cross_entropy_with_integer_labels(
                out, labels.astype(jnp.int32))
            loss = per.mean() if gm is None else \
                (per * gm).sum() / gm.sum()
        elif kind == "mse":
            target = labels.astype(out.dtype)
            if target.ndim == out.ndim - 1:
                target = target[..., None]
            per = (out - target) ** 2
            loss = per.mean() if gm is None else \
                (per * gm[:, None]).sum() / (gm.sum() * out.shape[-1])
        elif kind == "ecfp_mse":
            # MSE(sigmoid(out·mask), per-atom bits)
            # (test_graph_encode_norm_ecfp.py:137)
            if "node_labels" in batch:
                # PACKED layout: bits ride node-space (collate_packed).
                # Mean over REAL atom entries — the dense reference's
                # .mean() also averages constant (sigmoid(0)−0)² = 0.25
                # terms at padded slots, which contribute zero gradient;
                # the packed loss differs from it only by that constant
                # offset and the denominator (documented convention).
                # EXACT per-graph collapse (round 4): every node of
                # graph g shares the prediction row σ_g, so
                #   Σ_{v∈g} (σ_gb − y_vb)² = n_g·σ² − 2·σ·s1 + s1
                # with s1_gb = Σ_{v∈g} y_vb (bits are 0/1 ⇒ Σy² = Σy).
                # This never materializes the (nodes, bits) prediction
                # tensor the gather form needed — 24.8 → ~2 ms/step at
                # batch 1024 on the v5e. Padded nodes carry node_graph
                # = n_graphs (out of range): segment_sum drops them
                # structurally.
                nl = batch["node_labels"]
                nm = batch["node_mask"]
                ng = batch["node_graph"]
                n_graphs = out.shape[0]
                s1 = graph_label_sums(nl, ng, batch, n_graphs,
                                      out.dtype,
                                      node_window=ecfp_node_window)
                n_g = jax.ops.segment_sum(
                    nm[:, 0].astype(out.dtype), ng,
                    num_segments=n_graphs, indices_are_sorted=True)
                p = jax.nn.sigmoid(out)
                per = n_g[:, None] * (p * p) - 2.0 * p * s1 + s1
                loss = per.sum() / (nm.sum() * out.shape[-1])
            else:
                pred = jax.nn.sigmoid(out[:, None, :] * batch["mask"])
                loss = ((pred - labels) ** 2).mean()
        else:
            raise ValueError(kind)
        return loss, (out, new_state)
    return loss_fn


# ---------------------------------------------------------------------------
# steps
# ---------------------------------------------------------------------------

def make_train_step(net_cfg: NetworkConfig, tx, loss_kind: str,
                    compute_dtype: str = "float32",
                    spmm_vocab_fn=None, sddmm_fn=None, recurrence_fn=None,
                    fused_op=None, fused_inkernel_loss: bool = False,
                    ecfp_node_window: int | None = None):
    loss_fn = make_loss_fn(net_cfg, loss_kind,
                           spmm_vocab_fn=spmm_vocab_fn, sddmm_fn=sddmm_fn,
                           recurrence_fn=recurrence_fn, fused_op=fused_op,
                           fused_inkernel_loss=fused_inkernel_loss,
                           ecfp_node_window=ecfp_node_window)
    mixed = compute_dtype == "bfloat16"

    def _cast(tree, dtype):
        return jax.tree.map(
            lambda x: x.astype(dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype,
                                                      jnp.floating) else x,
            tree)

    # donate params/state/opt buffers — the loop always rebinds them, and
    # in-place reuse avoids a full parameter copy per step on TPU
    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(params, state, opt_state, batch):
        if mixed:
            # bf16 compute against f32 master params; grads/state back to f32
            def lf(p, s, b, t):
                return loss_fn(_cast(p, jnp.bfloat16),
                               _cast(s, jnp.bfloat16),
                               _cast(b, jnp.bfloat16), t)
        else:
            lf = loss_fn
        (loss, (out, new_state)), grads = jax.value_and_grad(
            lf, has_aux=True)(params, state, batch, True)
        if mixed:
            grads = _cast(grads, jnp.float32)
            new_state = _cast(new_state, jnp.float32)
            loss = loss.astype(jnp.float32)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return loss, params, new_state, opt_state

    return step


from functools import lru_cache


# NetworkConfig is frozen/hashable — caching avoids re-jitting per epoch
@lru_cache(maxsize=64)
def make_eval_step(net_cfg: NetworkConfig, loss_kind: str):
    loss_fn = make_loss_fn(net_cfg, loss_kind)

    @jax.jit
    def step(params, state, batch):
        loss, (out, _) = loss_fn(params, state, batch, False)
        return loss, out

    return step


# Serving-path eval steps: the MPNN core through the whole-step INFERENCE
# kernel (ONE pallas_call — kernels/fused_step.py::make_fused_eval_op;
# measured 6.9× the XLA sparse eval at batch 1024). Cached at module level
# keyed by (net_cfg, loss_kind, interpret, plan shape) so per-epoch
# evaluate() calls REUSE the compiled executable — a per-call cache would
# recompile the kernel every epoch. Plan shapes per run are ~1-2 (fixed
# packed caps + the final partial batch); size-capped (FIFO) so a
# long-lived process sweeping configs can't accumulate jitted executables
# forever (mirrors make_eval_step's lru_cache(maxsize=64)).
_FUSED_EVAL_STEPS: Dict[tuple, object] = {}
_FUSED_EVAL_STEPS_CAP = 64


def _fused_eval_plan_key(batch):
    """Static shape key of the whole-step eval kernel for this batch, or
    None when the batch carries no fused plan."""
    if "fs_win" not in batch:
        return None
    return (int(batch["fs_block_edges"]), int(batch["fs_window"]),
            int(batch["fs_node_window"]),
            int(np.asarray(batch["fs_win"]).shape[0]),
            int(np.asarray(batch["node_feats"]).shape[0]),
            int(np.asarray(batch["graph_mask"]).shape[0]))


# below this many graphs the fixed window machinery costs more than the
# launches it saves: XLA wins by ~5 µs at batch 1 (0.027 vs 0.032 ms,
# BASELINE.md small-batch serving table); the kernel takes over by batch 8
_FUSED_EVAL_MIN_GRAPHS = 8


def eval_step_for_batch(net_cfg: NetworkConfig, loss_kind: str, batch, *,
                        fuse_eval: bool = True, interpret: bool = False):
    """Pick the eval step for one batch: the fused serving kernel when the
    config and batch are eligible (packed, fused plan attached, flagship-
    shaped recurrence) and the batch is past the launch-bound small-batch
    crossover, the XLA path otherwise. Cached per plan shape."""
    key = None
    if (fuse_eval and "node_feats" in batch and "fs_win" in batch
            and int(np.asarray(batch["graph_mask"]).shape[0])
            >= _FUSED_EVAL_MIN_GRAPHS):
        from mpnn_tpu.models.fused_train import fused_eval_eligible
        if fused_eval_eligible(net_cfg.mpnn, batch):
            key = (net_cfg, loss_kind, interpret,
                   _fused_eval_plan_key(batch))
    if key is None:
        return make_eval_step(net_cfg, loss_kind)
    if key not in _FUSED_EVAL_STEPS:
        from mpnn_tpu.models.fused_train import make_fused_eval_for_batch
        eval_op = make_fused_eval_for_batch(net_cfg.mpnn, batch,
                                            interpret=interpret)
        loss_fn = make_loss_fn(net_cfg, loss_kind, eval_op=eval_op)

        @jax.jit
        def step(params, state, batch):
            loss, (out, _) = loss_fn(params, state, batch, False)
            return loss, out

        if len(_FUSED_EVAL_STEPS) >= _FUSED_EVAL_STEPS_CAP:
            _FUSED_EVAL_STEPS.pop(next(iter(_FUSED_EVAL_STEPS)))
        _FUSED_EVAL_STEPS[key] = step
    return _FUSED_EVAL_STEPS[key]


# ---------------------------------------------------------------------------
# evaluation
# ---------------------------------------------------------------------------

def evaluate(params, state, net_cfg: NetworkConfig, loader: GraphLoader,
             loss_kind: str, metric_average: str = "weighted", *,
             fuse_eval: bool = True, interpret: bool = False
             ) -> Dict[str, float]:
    """Eval-mode metrics over a loader. Batches that carry a fused plan
    (GraphLoader(fused_step_plan=True)) on an eligible config run the
    whole-step INFERENCE kernel — the serving path (6.9× the XLA eval at
    batch 1024); everything else takes the XLA step."""
    tot_loss, preds, trues = 0.0, [], []
    n_batches = 0
    for batch in loader:
        step = eval_step_for_batch(net_cfg, loss_kind, batch,
                                   fuse_eval=fuse_eval, interpret=interpret)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        loss, out = step(params, state, jb)
        tot_loss += float(loss)
        n_batches += 1
        if loss_kind == "ce":
            preds.extend(np.asarray(out).argmax(-1).tolist())
            trues.extend(np.asarray(batch["labels"]).tolist())
        elif loss_kind == "mse":
            preds.extend(np.asarray(out).reshape(-1).tolist())
            trues.extend(np.asarray(batch["labels"]).reshape(-1).tolist())
    result = {"loss": tot_loss / max(n_batches, 1)}
    if loss_kind == "ce":
        result.update(M.classification_report(trues, preds, metric_average))
    elif loss_kind == "mse":
        result["mse"] = M.mean_squared_error(trues, preds)
        result["rmse"] = M.rmse(trues, preds)
    return result


# ---------------------------------------------------------------------------
# the epoch driver
# ---------------------------------------------------------------------------

def train(net_cfg: NetworkConfig, cfg: TrainConfig,
          train_graphs, val_graphs=None, *,
          params=None, state=None, resume: bool = False,
          with_nafm: Optional[bool] = None):
    if with_nafm is None:
        with_nafm = net_cfg.input_wrapper == "graph_norm"
    key = jax.random.PRNGKey(cfg.seed)
    if params is None:
        params, state = network_init(key, net_cfg)
    tx = adam(cfg.learning_rate, weight_decay=cfg.weight_decay)
    opt_state = tx.init(params)
    sched = ReduceLROnPlateau(cfg.learning_rate) if cfg.plateau else None
    start_epoch = 0

    if resume and cfg.ckpt_dir:
        ck = latest_checkpoint(cfg.ckpt_dir)
        if ck:
            params, state, opt_state, meta = load_checkpoint(
                ck, params=params, state=state, opt_state=opt_state)
            start_epoch = int(meta.get("epoch", -1)) + 1
            if sched and "sched" in meta:
                sched.load_state_dict(meta["sched"])

    logger = MetricLogger(cfg.log_path)
    use_kernel = cfg.packed and cfg.spmm.startswith("kernel")
    collate = "packed" if cfg.packed else "dense"
    is_att = net_cfg.mpnn.message_fn == "att_edge_network"
    train_loader = GraphLoader(train_graphs, cfg.batch_size,
                               shuffle=cfg.shuffle, seed=cfg.seed,
                               collate=collate, with_nafm=with_nafm,
                               spmm_plan=use_kernel,
                               # transposed sddmm needs 128-aligned windows
                               spmm_align=128 if is_att else 16,
                               fused_step_plan=cfg.fuse_step and cfg.packed)
    spmm_vocab_fn = sddmm_fn = None
    if use_kernel and train_loader.spmm_window is not None:
        from mpnn_tpu.kernels.sddmm import make_sddmm_op
        from mpnn_tpu.kernels.spmm import make_spmm_op
        interp = cfg.spmm == "kernel_interpret"
        if is_att:
            # transposed layout shares one feature panel (mf==nf); the
            # rectangular case keeps the row layout
            lay = "t" if net_cfg.mpnn.message_features \
                == net_cfg.mpnn.node_features else "rows"
            sddmm_fn = make_sddmm_op(
                block_edges=train_loader.spmm_block_edges,
                window=train_loader.spmm_window, interpret=interp,
                layout=lay)
        else:
            spmm_vocab_fn = make_spmm_op(
                block_edges=train_loader.spmm_block_edges,
                window=train_loader.spmm_window, interpret=interp)
    recurrence_fn = None
    if cfg.fuse_recurrence and cfg.packed and train_loader._packed_caps:
        from mpnn_tpu.kernels.recurrence import make_recurrence_op_auto
        from mpnn_tpu.models.sparse import recurrence_eligible
        if recurrence_eligible(net_cfg.mpnn, training=True):
            recurrence_fn = make_recurrence_op_auto(
                net_cfg.mpnn.message_steps, net_cfg.mpnn.node_features,
                train_loader._packed_caps[0],
                interpret=cfg.spmm == "kernel_interpret")
    use_fused_step = False
    fused_inkernel = False
    if cfg.fuse_step and cfg.packed and cfg.compute_dtype == "float32":
        # whole-step fused kernel for the MPNN core (messages → readout in
        # one fwd pallas_call + 3-kernel bwd). Two flavors:
        #   * bare MPNN + masked MSE: the loss rides IN the kernel too
        #     (fused_flagship_loss);
        #   * any wrapper / head BN / dense head / loss (e.g. the REAL
        #     lipo driver): the kernel emits `out`, the rest stays in XLA
        #     and drives the backward through the out cotangent
        #     (fused_mpnn_out). ecfp_mse fuses when the batch carries the
        #     packed node-space bit labels (node_labels).
        from mpnn_tpu.models.fused_train import fused_step_eligible
        probe = next(iter(train_loader), None)
        ecfp_ok = cfg.loss != "ecfp_mse" or (probe is not None
                                             and "node_labels" in probe)
        if (probe is not None and ecfp_ok
                and fused_step_eligible(net_cfg.mpnn, probe,
                                        training=True)):
            use_fused_step = True
            fused_inkernel = (net_cfg.input_wrapper == "plain"
                              and net_cfg.head == "none"
                              and not net_cfg.head_bn
                              # the in-kernel loss reads the readout's out
                              # directly — obn configs go via fused_mpnn_out
                              and not net_cfg.mpnn.output_norm
                              # the att kernel emits h for an XLA readout —
                              # no in-kernel loss flavor
                              and net_cfg.mpnn.message_fn
                              in ("edge_network", "ggnn")
                              and net_cfg.mpnn.readout == "graph_level"
                              and cfg.loss == "mse"
                              and net_cfg.mpnn.output_dim == 1)

    # The fused-step op bakes the plan's static window sizes into the
    # kernel, but the loader auto-sizes plans PER BATCH (bucketed —
    # normally 1-2 distinct shapes per run). A single probe-built op fed a
    # batch planned at a different window would silently drop the edges
    # beyond its static slices, so the step function is CACHED PER PLAN
    # SHAPE: each distinct (fs_window, fs_node_window) gets its own fused
    # op + jitted step, and a batch whose plan declined (no 'fs_win')
    # falls back to the XLA/spmm-kernel step.
    _step_fns = {}

    def _make_step(fused_op, inkernel, ecfp_nw=None):
        return make_train_step(net_cfg, tx, cfg.loss, cfg.compute_dtype,
                               spmm_vocab_fn=spmm_vocab_fn,
                               sddmm_fn=sddmm_fn,
                               recurrence_fn=recurrence_fn,
                               fused_op=fused_op,
                               fused_inkernel_loss=inkernel,
                               ecfp_node_window=ecfp_nw)

    def _step_for_batch(batch):
        key = None
        # the ecfp loss's block-matmul label aggregate needs the plan's
        # STATIC node window (traced inside jit) — thread it from here
        # and key the cached step on it so a batch planned at a
        # different window can't reuse a step with the wrong bake
        ecfp_nw = None
        if cfg.loss == "ecfp_mse" and "fs_ns" in batch \
                and "fs_node_window" in batch:
            ecfp_nw = int(batch["fs_node_window"])
        if use_fused_step and "fs_win" in batch:
            # node AND graph counts are part of the key: the op bakes both
            # (h0 padding, per-graph one-hots, labels reshape), and the
            # final PARTIAL batch carries fewer graphs than the rest even
            # under fixed packed caps — it must get its own compiled op,
            # not the full-batch one (same rule as _fused_eval_plan_key)
            key = (int(batch["fs_block_edges"]), int(batch["fs_window"]),
                   int(batch["fs_node_window"]),
                   int(np.asarray(batch["fs_win"]).shape[0]),
                   int(np.asarray(batch["node_feats"]).shape[0]),
                   int(np.asarray(batch["graph_mask"]).shape[0]))
        fused_key = key is not None
        if key is None and ecfp_nw is not None:
            key = ("ecfp_nw", ecfp_nw,
                   int(np.asarray(batch["node_feats"]).shape[0]),
                   int(np.asarray(batch["graph_mask"]).shape[0]))
        if key not in _step_fns:
            fop = None
            if fused_key:
                from mpnn_tpu.models.fused_train import \
                    make_fused_step_for_batch
                fop = make_fused_step_for_batch(
                    net_cfg.mpnn, batch,
                    interpret=cfg.spmm == "kernel_interpret")
            _step_fns[key] = _make_step(fop, fused_inkernel and fused_key,
                                        ecfp_nw)
        return _step_fns[key]
    # the val loader carries the fused plan too, so per-epoch evaluation
    # rides the whole-step INFERENCE kernel whenever training does the
    # fused train kernel (same eligibility; fall-through is silent)
    val_loader = (GraphLoader(val_graphs, cfg.batch_size, shuffle=False,
                              collate=collate, with_nafm=with_nafm,
                              fused_step_plan=cfg.fuse_step and cfg.packed)
                  if val_graphs is not None else None)

    preempted = {"flag": False}
    prev_handler = None
    if cfg.handle_preemption and cfg.ckpt_dir:
        import signal
        import threading

        def _on_term(signum, frame):
            preempted["flag"] = True

        if threading.current_thread() is threading.main_thread():
            prev_handler = signal.signal(signal.SIGTERM, _on_term)

    def _save(epoch, p, s, o):
        os.makedirs(cfg.ckpt_dir, exist_ok=True)
        save_checkpoint(
            os.path.join(cfg.ckpt_dir, f"ckpt_{epoch}.npz"),
            params=p, state=s, opt_state=o,
            meta={"epoch": epoch,
                  "sched": sched.state_dict() if sched else None})

    # Preemption needs the state AS OF the last COMPLETE epoch: the train
    # step donates its buffers, so mid-epoch params cannot stand in for the
    # end-of-epoch ones (saving them under epoch-1 would make resume re-run
    # the interrupted epoch on top of already-applied updates). Keep a host
    # snapshot taken at each epoch boundary instead.
    snapshot = None          # ((params, state, opt_state) host copies, epoch)
    take_snapshots = cfg.handle_preemption and cfg.ckpt_dir

    history = []
    for epoch in range(start_epoch, cfg.epochs):
        epoch_loss, n_batches = 0.0, 0
        for batch in train_loader:
            if preempted["flag"]:
                break
            step_fn = _step_for_batch(batch)
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            loss, params, state, opt_state = step_fn(
                params, state, opt_state, jb)
            epoch_loss += float(loss)
            n_batches += 1
        if preempted["flag"]:
            # graceful preemption: persist the last COMPLETE epoch so
            # --resume restarts exactly here, then stop
            if n_batches == len(train_loader):
                _save(epoch, params, state, opt_state)
            elif snapshot is not None:
                (sp, ss, so), done = snapshot
                _save(done, sp, ss, so)
            # else: nothing completed since start/resume — the newest
            # checkpoint already on disk is the correct resume point
            logger.log(epoch=epoch, preempted=True)
            break
        if take_snapshots:
            snapshot = (jax.tree.map(np.asarray,
                                     (params, state, opt_state)), epoch)
        record = {"epoch": epoch, "train_loss": epoch_loss,
                  "lr": get_learning_rate(opt_state)}

        if val_loader is not None:
            val = evaluate(params, state, net_cfg, val_loader, cfg.loss,
                           cfg.metric_average,
                           interpret=cfg.spmm == "kernel_interpret")
            record.update({f"val_{k}": v for k, v in val.items()})
            if sched:
                new_lr = sched.step(val["loss"])
                opt_state = set_learning_rate(opt_state, new_lr)
        logger.log(**record)
        history.append(record)

        if cfg.ckpt_dir and (epoch % cfg.ckpt_every == 0
                             or epoch == cfg.epochs - 1):
            gate_ok = True
            if cfg.ckpt_f1_gate is not None:
                f1 = record.get("val_f1")
                gate_ok = f1 is not None and np.isfinite(f1) \
                    and f1 > cfg.ckpt_f1_gate
            if gate_ok:
                _save(epoch, params, state, opt_state)

        if cfg.early_stop_loss is not None \
                and epoch_loss < cfg.early_stop_loss:
            break

    if prev_handler is not None:
        import signal
        signal.signal(signal.SIGTERM, prev_handler)
    logger.close()
    return params, state, opt_state, history
