"""Attribute the fused-step train-step time (the q17 bench default).

The step is: vocab edge-MLP chain + A-fold (XLA) -> ONE forward
pallas_call (kernels/fused_step.py) -> 3 backward kernels (readout+loss
bwd, merged-recurrence VJP, message bwd) -> EMA folds + Adam (XLA).
Probes cut at those boundaries; consecutive deltas attribute time:

  full       : the bench-default program (grad + Adam, 50 steps/dispatch)
  no_opt     : grads computed, no tx.update/apply
  fwd_only   : fused_flagship_loss forward only (vocab chain + fwd kernel
               + EMA folds), no grad
  kernel_fwd : the fwd pallas_call alone on PRE-BUILT amat/a0 operands
               (excludes the vocab chain and A-fold)
  skip_ro / skip_rec / skip_msg : the full program with ONE backward
               kernel replaced by zero stand-ins (MPNN_FS_BWD_SKIP hook in
               kernels/fused_step.py) — the delta vs `full` attributes
               that kernel's cost

Usage: python scripts/ablate_fused.py [probe ...]   (default: all)
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/mpnn_tpu_jaxcache")

import jax.numpy as jnp
import numpy as np
import optax

BATCH = 1024
SPC = 50
ITERS = 10


def build():
    import bench
    from mpnn_tpu import graphs as G
    from mpnn_tpu import models
    from mpnn_tpu.kernels.fused_step import attach_fused_plan
    from mpnn_tpu.models.fused_train import (fused_step_eligible,
                                             make_fused_step_for_batch)
    from mpnn_tpu.train.optim import adam

    gs, ge = bench.build_batch(BATCH)
    cfg = bench.flagship_mpnn_cfg(ge)
    params, state = models.mpnn_init(jax.random.PRNGKey(317), cfg)
    packed = G.collate_packed(gs).as_dict()
    packed = G.attach_edge_vocab(packed, vocab_cap=16)
    packed = attach_fused_plan(packed, block_edges=512)
    packed["node_feats"] = np.concatenate(
        [packed["node_feats"], packed["node_nafm"]], axis=-1)
    assert fused_step_eligible(cfg, packed, training=True)
    fused_op = make_fused_step_for_batch(cfg, packed)
    jb = {k: jnp.asarray(v) if not np.isscalar(v) else v
          for k, v in packed.items()}
    labels0 = jnp.asarray(np.random.RandomState(0).randn(
        packed["graph_mask"].shape[0]).astype(np.float32))
    tx = adam(1e-3, weight_decay=1e-4)
    return cfg, params, state, jb, labels0, tx, fused_op


def run_probe(name, step, carry, jb, labels0):
    carry, l = step(*carry, jb, labels0, jnp.int32(0))
    jax.device_get(l)
    t0 = time.perf_counter()
    for i in range(ITERS):
        carry, l = step(*carry, jb, labels0, jnp.int32(i + 1))
    lv = float(jax.device_get(l))
    dt = time.perf_counter() - t0
    assert np.isfinite(lv), f"{name}: non-finite loss {lv}"
    ms = dt / (ITERS * SPC) * 1e3
    print(f"[ablate] {name} {ms:.3f} ms/step (loss {lv:.4f})", flush=True)
    return ms


def main(which):
    from mpnn_tpu.models.fused_train import fused_flagship_loss

    cfg, params, state, jb, labels0, tx, fused_op = build()
    opt_state = tx.init(params)

    def scan_wrap(body_fn):
        copts = {}
        if os.environ.get("MPNN_SCOPED_VMEM_KIB"):
            copts["xla_tpu_scoped_vmem_limit_kib"] = \
                os.environ["MPNN_SCOPED_VMEM_KIB"]

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2),
                           compiler_options=copts or None)
        def step(params, state, opt_state, jb, labels0, it):
            def body(carry, k):
                return body_fn(carry, labels0 + 1e-4 * (it * SPC + k), jb)
            (p, s, o), ls = jax.lax.scan(
                body, (params, state, opt_state), jnp.arange(SPC))
            return (p, s, o), ls[-1]
        return step

    def full_body(carry, labels, jb):
        params, state, opt_state = carry

        def loss_fn(p, s):
            l, _, ns = fused_flagship_loss(p, s, cfg, jb, labels, fused_op)
            return l, ns
        (l, ns), g = jax.value_and_grad(loss_fn, has_aux=True)(params, state)
        u, o2 = tx.update(g, opt_state, params)
        return (optax.apply_updates(params, u), ns, o2), l

    def no_opt_body(carry, labels, jb):
        params, state, opt_state = carry

        def loss_fn(p, s):
            l, _, ns = fused_flagship_loss(p, s, cfg, jb, labels, fused_op)
            return l, ns
        (l, ns), g = jax.value_and_grad(loss_fn, has_aux=True)(params, state)
        bump = sum(jnp.sum(x) for x in jax.tree.leaves(g)) * 0.0
        return (params, ns, opt_state), l + bump

    def fwd_only_body(carry, labels, jb):
        params, state, opt_state = carry
        l, _, ns = fused_flagship_loss(params, state, cfg, jb, labels,
                                       fused_op)
        return (params, ns, opt_state), l

    def kernel_fwd_body_factory():
        # pre-build the kernel operands once outside the loop: isolates
        # the fwd pallas_call from the vocab chain + A-fold
        from mpnn_tpu.models.sparse import _edge_penultimates
        p = params
        h0 = jb["node_feats"] * jb["node_mask"]
        ef = jb["edge_feats"] * jb["edge_mask"][:, None]
        mp = p["message"][0]
        pen, pen0, pen_vocab = _edge_penultimates(
            mp, ef, cfg, jb.get("edge_vid"), jb.get("edge_vfirst"), None)
        nf, mf = cfg.node_features, cfg.message_features
        pf = pen0.shape[-1]
        wf = mp["final"]["w"].reshape(pf, mf, nf)
        bf = mp["final"]["b"].reshape(mf, nf)
        amat = jnp.einsum("kp,pmf->kmf", pen_vocab - pen0, wf)
        a0 = jnp.einsum("p,pmf->mf", pen0[0], wf) + bf
        amat, a0, h0 = map(jax.device_put, (amat, a0, h0))

        def body(carry, labels, jb):
            params, state, opt_state = carry
            l, out, _, _ = fused_op(
                amat, a0, params["message"][0]["message_bias"], h0,
                jb["node_mask"], jb["node_graph"], params["gru"],
                params["ma_bn"][0], params["bn"][0], params["readout"],
                labels, jb["graph_mask"], jb["edge_vid"], jb["edge_src"],
                jb["edge_dst"], jb["fs_win"], jb["fs_ns"])
            return (params, state, opt_state), l
        return body

    probes = {
        "full": full_body,
        "no_opt": no_opt_body,
        "fwd_only": fwd_only_body,
        "kernel_fwd": kernel_fwd_body_factory(),
        "skip_ro": full_body,
        "skip_rec": full_body,
        "skip_msg": full_body,
    }
    results = {}
    for name in which:
        if name.startswith("skip_"):
            os.environ["MPNN_FS_BWD_SKIP"] = name[5:]
        else:
            os.environ.pop("MPNN_FS_BWD_SKIP", None)
        step = scan_wrap(probes[name])
        p = jax.tree.map(jnp.copy, params)
        s = jax.tree.map(jnp.copy, state)
        o = jax.tree.map(jnp.copy, opt_state)
        results[name] = run_probe(name, step, (p, s, o), jb, labels0)
        os.environ.pop("MPNN_FS_BWD_SKIP", None)
    print("[ablate] RESULTS " + " ".join(
        f"{k}={v:.3f}" for k, v in results.items()), flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["full", "no_opt", "fwd_only", "kernel_fwd"]
    main(which)
