"""Attribute the flagship train-step time to its components (TPU probe).

Runs the bench-default program (batch 1024, SpMM kernel + fused recurrence,
50 steps/dispatch, donated buffers, anti-replay label perturbation) CUT at
successive pipeline boundaries, so consecutive deltas attribute time:

  full        : messages -> recurrence -> readout -> loss -> grad -> Adam
  no_opt      : same but WITHOUT tx.update/apply (grads still computed)
  no_readout  : loss = masked sum of the recurrence output h (skips
                readout + output chain; grad + Adam on the reached params)
  msgs_only   : loss = sum of msgs_raw (skips recurrence too)
  spmm_only   : just the Pallas SpMM op fwd+bwd on fixed operands
  fwd_only    : full forward, no grad / no optimizer

Usage: python scripts/ablate_step.py [probe ...]   (default: all)
Each probe prints one line:  [ablate] <name> <ms/step> ms
"""

from __future__ import annotations

import functools
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
    from mpnn_tpu.kernels.recurrence import make_recurrence_op_auto
    from mpnn_tpu.kernels.spmm import attach_spmm_plan, make_spmm_op
    from mpnn_tpu.train.optim import adam

    gs, ge = bench.build_batch(BATCH)
    cfg = bench.flagship_mpnn_cfg(ge)
    params, state = models.mpnn_init(jax.random.PRNGKey(317), cfg)
    packed = G.collate_packed(gs).as_dict()
    packed = G.attach_edge_vocab(packed, vocab_cap=16)
    packed = attach_spmm_plan(packed, block_edges=512)
    be = packed.pop("spmm_block_edges")
    win = packed.pop("spmm_window")
    spmm_op = make_spmm_op(block_edges=be, window=win)
    packed["node_feats"] = np.concatenate(
        [packed["node_feats"], packed["node_nafm"]], axis=-1)
    rec_op = make_recurrence_op_auto(cfg.message_steps, cfg.node_features,
                                     int(packed["node_feats"].shape[0]))
    jb = {k: jnp.asarray(v) if not np.isscalar(v) else v
          for k, v in packed.items()}
    labels0 = jnp.asarray(np.random.RandomState(0).randn(
        packed["graph_mask"].shape[0]).astype(np.float32))
    tx = adam(1e-3, weight_decay=1e-4)
    return cfg, params, state, jb, labels0, tx, spmm_op, rec_op


def run_probe(name, make_step, carry, jb, labels0):
    step = make_step
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


def fwd_parts(cfg, params, state, jb, spmm_op, rec_op):
    """messages -> recurrence, replicating sparse_mpnn_apply's fused path."""
    from mpnn_tpu.models.sparse import (_edge_penultimates,
                                        sparse_edge_network_fused)

    h0 = jb["node_feats"] * jb["node_mask"]
    ef = jb["edge_feats"] * jb["edge_mask"][:, None]
    pen, pen0, pen_vocab = _edge_penultimates(
        params["message"][0], ef, cfg, jb.get("edge_vid"),
        jb.get("edge_vfirst"), None)
    msgs_raw = sparse_edge_network_fused(
        params["message"][0], pen, pen0, h0, jb["edge_src"],
        jb["edge_dst"], jb["node_graph"], jb["graph_mask"],
        nf=cfg.node_features, mf=cfg.message_features,
        pen_vocab=pen_vocab, edge_vid=jb.get("edge_vid"),
        spmm_vocab_fn=spmm_op, spmm_win=jb.get("spmm_win"))
    return h0, msgs_raw


def main(which):
    from mpnn_tpu.models.sparse import sparse_mpnn_apply

    cfg, params, state, jb, labels0, tx, spmm_op, rec_op = build()
    opt_state = tx.init(params)

    def scan_wrap(body_fn):
        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
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
            out, ns = sparse_mpnn_apply(p, s, cfg, jb, training=True,
                                        spmm_vocab_fn=spmm_op,
                                        recurrence_fn=rec_op)
            gm = jb["graph_mask"][:, None]
            per = ((out - labels[:, None]) ** 2) * gm
            return per.sum() / gm.sum(), ns
        (l, ns), g = jax.value_and_grad(loss_fn, has_aux=True)(params, state)
        u, o2 = tx.update(g, opt_state, params)
        return (optax.apply_updates(params, u), ns, o2), l

    def no_opt_body(carry, labels, jb):
        params, state, opt_state = carry

        def loss_fn(p, s):
            out, ns = sparse_mpnn_apply(p, s, cfg, jb, training=True,
                                        spmm_vocab_fn=spmm_op,
                                        recurrence_fn=rec_op)
            gm = jb["graph_mask"][:, None]
            per = ((out - labels[:, None]) ** 2) * gm
            return per.sum() / gm.sum(), ns
        (l, ns), g = jax.value_and_grad(loss_fn, has_aux=True)(params, state)
        # consume g so it isn't DCE'd, without an optimizer step
        bump = sum(jnp.sum(x) for x in jax.tree.leaves(g)) * 0.0
        return (params, ns, opt_state), l + bump

    def no_readout_body(carry, labels, jb):
        params, state, opt_state = carry

        def loss_fn(p):
            h0, msgs_raw = fwd_parts(cfg, p, state, jb, spmm_op, rec_op)
            h, _, _ = rec_op(msgs_raw, h0, jb["node_mask"], p["gru"],
                             p["ma_bn"][0], p["bn"][0])
            return jnp.sum(h * jb["node_mask"]) * 1e-3 + labels[0] * 0.0
        l, g = jax.value_and_grad(loss_fn)(params)
        u, o2 = tx.update(g, opt_state, params)
        return (optax.apply_updates(params, u), state, o2), l

    def msgs_only_body(carry, labels, jb):
        params, state, opt_state = carry

        def loss_fn(p):
            h0, msgs_raw = fwd_parts(cfg, p, state, jb, spmm_op, rec_op)
            return jnp.sum(msgs_raw) * 1e-3 + labels[0] * 0.0
        l, g = jax.value_and_grad(loss_fn)(params)
        u, o2 = tx.update(g, opt_state, params)
        return (optax.apply_updates(params, u), state, o2), l

    def fwd_only_body(carry, labels, jb):
        params, state, opt_state = carry
        out, ns = sparse_mpnn_apply(params, state, cfg, jb, training=True,
                                    spmm_vocab_fn=spmm_op,
                                    recurrence_fn=rec_op)
        gm = jb["graph_mask"][:, None]
        per = ((out - labels[:, None]) ** 2) * gm
        return (params, ns, opt_state), per.sum() / gm.sum()

    probes = {
        "full": full_body,
        "no_opt": no_opt_body,
        "no_readout": no_readout_body,
        "msgs_only": msgs_only_body,
        "fwd_only": fwd_only_body,
    }
    results = {}
    for name in which:
        if name == "spmm_only":
            results[name] = spmm_probe(cfg, params, jb, spmm_op)
            continue
        step = scan_wrap(probes[name])
        p = jax.tree.map(jnp.copy, params)
        s = jax.tree.map(jnp.copy, state)
        o = jax.tree.map(jnp.copy, opt_state)
        results[name] = run_probe(name, step, (p, s, o), jb, labels0)
    print("[ablate] RESULTS " + " ".join(
        f"{k}={v:.3f}" for k, v in results.items()), flush=True)


def spmm_probe(cfg, params, jb, spmm_op):
    """Isolated SpMM fwd+bwd (the op's own cost at bench shapes)."""
    nf, mf = cfg.node_features, cfg.message_features
    kk = int(jb["edge_vfirst"].shape[0])
    a = jnp.asarray(np.random.RandomState(1).randn(kk, mf, nf)
                    .astype(np.float32)) * 0.1
    h = jb["node_feats"] * jb["node_mask"]

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(a, h, it):
        def body(carry, k):
            a, h = carry

            def loss_fn(a, h):
                out = spmm_op(a, h + 1e-6 * k, jb["edge_vid"],
                              jb["edge_src"], jb["edge_dst"], jb["spmm_win"])
                return jnp.sum(out)
            l, (da, dh) = jax.value_and_grad(loss_fn, argnums=(0, 1))(a, h)
            return (a + 1e-9 * da, h + 1e-9 * dh), l
        (a, h), ls = jax.lax.scan(body, (a, h), jnp.arange(SPC))
        return (a, h), ls[-1]

    carry, l = step(a, h, jnp.int32(0))
    jax.device_get(l)
    t0 = time.perf_counter()
    for i in range(ITERS):
        carry, l = step(*carry, jnp.int32(i + 1))
    lv = float(jax.device_get(l))
    dt = time.perf_counter() - t0
    assert np.isfinite(lv)
    ms = dt / (ITERS * SPC) * 1e3
    print(f"[ablate] spmm_only {ms:.3f} ms/step (loss {lv:.4f})", flush=True)
    return ms


if __name__ == "__main__":
    names = sys.argv[1:] or ["full", "no_opt", "no_readout", "msgs_only",
                             "spmm_only", "fwd_only"]
    main(names)
