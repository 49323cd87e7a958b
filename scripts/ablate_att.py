"""Attribute the attention-family train-step time (bench --model att).

The att step (AttEdgeNetwork + att aggregation + set2vec, 3 message
steps, XLA sparse path) measured 5.67 ms at batch 1024 — 12× the fused
flagship. Probes cut the pipeline so consecutive deltas attribute time:

  full       : the att bench program (grad + Adam, 50 steps/dispatch)
  no_opt     : grads computed, no tx.update/apply
  fwd_only   : forward only
  no_readout : loss = masked sum of the final node state (skips set2vec
               fwd+bwd; grad+Adam on the reached params)
  msgs_only  : loss = sum of the first message pass (one att message
               fwd+bwd; skips GRU steps and readout)

Usage: python scripts/ablate_att.py [probe ...]   (default: all)
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

    from mpnn_tpu.train.optim import adam

    gs, ge = bench.build_batch(BATCH)
    cfg = bench.att_mpnn_cfg(ge)
    params, state = models.mpnn_init(jax.random.PRNGKey(317), cfg)
    packed = G.collate_packed(gs).as_dict()
    packed = G.attach_edge_vocab(packed, vocab_cap=16)
    packed["node_feats"] = np.concatenate(
        [packed["node_feats"], packed["node_nafm"]], axis=-1)
    jb = {k: jnp.asarray(v) if not np.isscalar(v) else v
          for k, v in packed.items()}
    labels0 = jnp.asarray(np.random.RandomState(0).randn(
        packed["graph_mask"].shape[0]).astype(np.float32))
    tx = adam(1e-3, weight_decay=1e-4)
    return cfg, params, state, jb, labels0, tx


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
    from mpnn_tpu.models.sparse import (_edge_penultimates,
                                        sparse_att_edge_network,
                                        sparse_mpnn_apply)
    from mpnn_tpu.ops.update import gru_apply

    cfg, params, state, jb, labels0, tx = build()
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

    def loss_full(p, s, jb, labels):
        out, ns = sparse_mpnn_apply(p, s, cfg, jb, training=True)
        gm = jb["graph_mask"][:, None]
        per = ((out - labels[:, None]) ** 2) * gm
        return per.sum() / gm.sum(), ns

    def full_body(carry, labels, jb):
        params, state, opt_state = carry
        (l, ns), g = jax.value_and_grad(
            lambda p, s: loss_full(p, s, jb, labels),
            argnums=(0,), has_aux=True)(params, state)
        u, o2 = tx.update(g[0], opt_state, params)
        return (optax.apply_updates(params, u), ns, o2), l

    def no_opt_body(carry, labels, jb):
        params, state, opt_state = carry
        (l, ns), g = jax.value_and_grad(
            lambda p, s: loss_full(p, s, jb, labels),
            argnums=(0,), has_aux=True)(params, state)
        bump = sum(jnp.sum(x) for x in jax.tree.leaves(g)) * 0.0
        return (params, ns, opt_state), l + bump

    def fwd_only_body(carry, labels, jb):
        params, state, opt_state = carry
        l, ns = loss_full(params, state, jb, labels)
        return (params, ns, opt_state), l

    def steps_fwd(p, jb):
        """messages + GRU steps, replicating the att branch of
        sparse_mpnn_apply (update_hidden='initial', no norms)."""
        h0 = jb["node_feats"] * jb["node_mask"]
        ef = jb["edge_feats"] * jb["edge_mask"][:, None]
        mask = jb["node_mask"]
        pen, pen0, pen_vocab = _edge_penultimates(
            p["message"][0], ef, cfg, jb.get("edge_vid"),
            jb.get("edge_vfirst"), None)
        h = h0
        for _ in range(cfg.message_steps):
            msgs = sparse_att_edge_network(
                p["message"][0], pen, pen0, h, ef,
                jb["edge_src"], jb["edge_dst"], jb["node_graph"],
                jb["graph_mask"], nf=cfg.node_features,
                mf=cfg.message_features, aggregation=cfg.aggregation,
                pen_vocab=pen_vocab, edge_vid=jb.get("edge_vid"),
                edge_vfirst=jb.get("edge_vfirst"))
            h = gru_apply(p["gru"], msgs[None], h0[None], mask[None])[0]
        return h, mask

    def no_readout_body(carry, labels, jb):
        params, state, opt_state = carry

        def loss_fn(p):
            h, mask = steps_fwd(p, jb)
            return jnp.sum(h * mask) * 1e-3 + labels[0] * 0.0
        l, g = jax.value_and_grad(loss_fn)(params)
        u, o2 = tx.update(g, opt_state, params)
        return (optax.apply_updates(params, u), state, o2), l

    def msgs_only_body(carry, labels, jb):
        params, state, opt_state = carry

        def loss_fn(p):
            h0 = jb["node_feats"] * jb["node_mask"]
            ef = jb["edge_feats"] * jb["edge_mask"][:, None]
            pen, pen0, pen_vocab = _edge_penultimates(
                p["message"][0], ef, cfg, jb.get("edge_vid"),
                jb.get("edge_vfirst"), None)
            msgs = sparse_att_edge_network(
                p["message"][0], pen, pen0, h0, ef,
                jb["edge_src"], jb["edge_dst"], jb["node_graph"],
                jb["graph_mask"], nf=cfg.node_features,
                mf=cfg.message_features, aggregation=cfg.aggregation,
                pen_vocab=pen_vocab, edge_vid=jb.get("edge_vid"),
                edge_vfirst=jb.get("edge_vfirst"))
            return jnp.sum(msgs) * 1e-3 + labels[0] * 0.0
        l, g = jax.value_and_grad(loss_fn)(params)
        u, o2 = tx.update(g, opt_state, params)
        return (optax.apply_updates(params, u), state, o2), l

    probes = {
        "full": full_body,
        "no_opt": no_opt_body,
        "fwd_only": fwd_only_body,
        "no_readout": no_readout_body,
        "msgs_only": msgs_only_body,
    }
    results = {}
    for name in which:
        step = scan_wrap(probes[name])
        p = jax.tree.map(jnp.copy, params)
        s = jax.tree.map(jnp.copy, state)
        o = jax.tree.map(jnp.copy, opt_state)
        results[name] = run_probe(name, step, (p, s, o), jb, labels0)
    print("[ablate] RESULTS " + " ".join(
        f"{k}={v:.3f}" for k, v in results.items()), flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["full", "no_opt", "fwd_only", "no_readout",
                             "msgs_only"]
    main(which)
