"""Validate TPU timing honesty over the axon tunnel.

Three measurements of the SAME flagship multi-step program:
  A) bench.py's method: async dispatch loop + block_until_ready(loss)
  B) dispatch loop + jax.device_get(loss)  (host copy forces completion)
  C) fully synchronous: device_get after EVERY dispatch

If block_until_ready resolves before device compute finishes (experimental
PJRT backend), A ≪ B and the round-1 throughput numbers are inflated.
Also times the isolated ×50 edge-MLP tail for a FLOP sanity cross-check.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mpnn_tpu_jaxcache")


def main(batch=1024, iters=30):
    import bench

    # reuse bench's builder but time three ways
    import functools
    import optax
    from mpnn_tpu import graphs as G
    from mpnn_tpu import models
    from mpnn_tpu.models.sparse import sparse_mpnn_apply
    from mpnn_tpu.train.optim import adam

    gs, ge = bench.build_batch(batch)
    cfg = bench.flagship_mpnn_cfg(ge)
    params, state = models.mpnn_init(jax.random.PRNGKey(317), cfg)
    packed = G.collate_packed(gs).as_dict()
    packed["node_feats"] = np.concatenate(
        [packed["node_feats"], packed["node_nafm"]], axis=-1)
    real_edges = int(packed["edge_mask"].sum())
    jb = {k: jnp.asarray(v) if not np.isscalar(v) else v
          for k, v in packed.items()}
    labels = jnp.asarray(np.random.RandomState(0).randn(
        packed["graph_mask"].shape[0]).astype(np.float32))
    tx = adam(1e-3, weight_decay=1e-4)
    opt_state = tx.init(params)
    SPC = 10

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def multi_step(params, state, opt_state, jb, labels):
        def body(carry, _):
            params, state, opt_state = carry

            def loss_fn(p, s):
                out, ns = sparse_mpnn_apply(p, s, cfg, jb, training=True)
                gm = jb["graph_mask"][:, None]
                per = ((out - labels[:, None]) ** 2) * gm
                return per.sum() / gm.sum(), ns

            (l, ns), g = jax.value_and_grad(
                loss_fn, has_aux=True)(params, state)
            updates, opt_state2 = tx.update(g, opt_state, params)
            params2 = optax.apply_updates(params, updates)
            return (params2, ns, opt_state2), l

        (params, state, opt_state), ls = jax.lax.scan(
            body, (params, state, opt_state), None, length=SPC)
        return params, state, opt_state, ls[-1]

    # warmup
    params, state, opt_state, l = multi_step(params, state, opt_state, jb,
                                             labels)
    l = jax.device_get(l)
    em = real_edges * cfg.message_steps * iters * SPC

    # A) block_until_ready
    t0 = time.perf_counter()
    for _ in range(iters):
        params, state, opt_state, l = multi_step(params, state, opt_state,
                                                 jb, labels)
    jax.block_until_ready(l)
    dt_a = time.perf_counter() - t0

    # B) device_get at the end
    t0 = time.perf_counter()
    for _ in range(iters):
        params, state, opt_state, l = multi_step(params, state, opt_state,
                                                 jb, labels)
    lv = jax.device_get(l)
    dt_b = time.perf_counter() - t0

    # C) synchronous per dispatch
    t0 = time.perf_counter()
    for _ in range(iters):
        params, state, opt_state, l = multi_step(params, state, opt_state,
                                                 jb, labels)
        jax.device_get(l)
    dt_c = time.perf_counter() - t0

    print(f"batch={batch} E={real_edges} iters={iters} x {SPC} steps")
    print(f"A block_until_ready : {dt_a*1e3:8.2f} ms  "
          f"→ {em/dt_a/1e9:8.3f} B edge-msgs/s")
    print(f"B device_get(end)   : {dt_b*1e3:8.2f} ms  "
          f"→ {em/dt_b/1e9:8.3f} B edge-msgs/s")
    print(f"C device_get(each)  : {dt_c*1e3:8.2f} ms  "
          f"→ {em/dt_c/1e9:8.3f} B edge-msgs/s")

    # isolated ×50 tail cross-check
    from mpnn_tpu.ops.message import _edge_mlp_penultimate
    mp = params["message"][0]
    ef = jb["edge_feats"]

    @jax.jit
    def tail(mp, e):
        return _edge_mlp_penultimate(mp, e, jax.nn.relu, 50)

    p = tail(mp, ef)
    jax.device_get(p)
    t0 = time.perf_counter()
    for _ in range(20):
        p = tail(mp, ef)
    jax.device_get(p)
    dt = (time.perf_counter() - t0) / 20
    E, efw = ef.shape
    pf = p.shape[-1]
    fl = 50 * E * pf * pf * 2 + E * efw * pf * 2
    print(f"tail fwd alone: {dt*1e6:.1f} µs  ({fl/dt/1e12:.2f} TFLOP/s "
          f"at E={E}, pf={pf})")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
