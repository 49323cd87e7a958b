"""Exact FLOP/byte accounting for the sparse train step, per family.

Compiles the SAME multi-step program bench.py times (forward + backward +
Adam, lax.scan over STEPS_PER_CALL steps) on the CPU backend and reads
XLA's cost model (`compiled.cost_analysis()`), so the speed-of-light math
in BASELINE.md rests on the compiler's own FLOP count rather than hand
estimates. Usage:
    python scripts/sol_accounting.py [--model flagship|att|encoded|...]
                                     [batch ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import functools  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402


def accounting(batch_size: int, dtype: str = "float32",
               steps_per_call: int = 10, model: str = "flagship"):
    import bench
    from mpnn_tpu import graphs as G
    from mpnn_tpu import models
    from mpnn_tpu.models.sparse import sparse_mpnn_apply
    from mpnn_tpu.train.optim import adam

    gs, ge = bench.build_batch(batch_size, edge_types=(model == "ggnn"))
    cfg = {"flagship": bench.flagship_mpnn_cfg, "att": bench.att_mpnn_cfg,
           "ggnn": bench.ggnn_mpnn_cfg, "encoded": bench.encoded_mpnn_cfg,
           "att_model": bench.att_model_mpnn_cfg,
           "basic": bench.basic_mpnn_cfg,
           "graph_norm": bench.graph_norm_mpnn_cfg}[model](ge)
    params, state = models.mpnn_init(jax.random.PRNGKey(317), cfg)
    packed = G.collate_packed(gs).as_dict()
    if model == "ggnn":
        packed = G.with_edge_types(packed, gs)
    packed["node_feats"] = np.concatenate(
        [packed["node_feats"], packed["node_nafm"]], axis=-1)
    real_edges = int(packed["edge_mask"].sum())
    jb = {k: jnp.asarray(v) if not np.isscalar(v) else v
          for k, v in packed.items()}
    labels = jnp.asarray(np.random.RandomState(0).randn(
        packed["graph_mask"].shape[0]).astype(np.float32))
    cdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32

    tx = adam(1e-3, weight_decay=1e-4)
    opt_state = tx.init(params)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def multi_step(params, state, opt_state, jb, labels):
        def body(carry, _):
            params, state, opt_state = carry

            def loss_fn(p, s):
                cp = jax.tree.map(lambda x: x.astype(cdtype), p) \
                    if dtype == "bfloat16" else p
                cs = jax.tree.map(lambda x: x.astype(cdtype), s) \
                    if dtype == "bfloat16" else s
                out, ns = sparse_mpnn_apply(cp, cs, cfg, jb, training=True)
                gm = jb["graph_mask"][:, None]
                per = ((out.astype(jnp.float32) - labels[:, None]) ** 2) * gm
                return per.sum() / gm.sum(), ns

            (l, ns), g = jax.value_and_grad(
                loss_fn, has_aux=True)(params, state)
            g = jax.tree.map(lambda x: x.astype(jnp.float32), g)
            ns = jax.tree.map(lambda x: x.astype(jnp.float32), ns)
            updates, opt_state2 = tx.update(g, opt_state, params)
            params2 = optax.apply_updates(params, updates)
            return (params2, ns, opt_state2), l

        (params, state, opt_state), ls = jax.lax.scan(
            body, (params, state, opt_state), None, length=steps_per_call)
        return params, state, opt_state, ls[-1]

    if dtype == "bfloat16":
        jb = {k: (v.astype(cdtype) if hasattr(v, "dtype")
                  and v.dtype == jnp.float32 else v) for k, v in jb.items()}
    lowered = multi_step.lower(params, state, opt_state, jb, labels)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops_per_step = ca.get("flops", float("nan")) / steps_per_call
    bytes_per_step = ca.get("bytes accessed", float("nan")) / steps_per_call
    node_cap = int(jb["node_feats"].shape[0])
    edge_cap = int(jb["edge_src"].shape[0])
    pf = None
    from mpnn_tpu.ops.message import edge_mlp_head_dims
    _, pf = edge_mlp_head_dims(cfg.edge_features, cfg.node_features,
                               cfg.message_features)
    print(f"model={model} batch={batch_size} dtype={dtype} "
          f"real_edges={real_edges} "
          f"node_cap={node_cap} edge_cap={edge_cap} "
          f"nf={cfg.node_features} mf={cfg.message_features} pf={pf}")
    print(f"  flops/train-step      = {flops_per_step:.3e}")
    print(f"  bytes-accessed/step   = {bytes_per_step:.3e}")
    em = real_edges * cfg.message_steps
    print(f"  edge-messages/step    = {em}")
    print(f"  flops per edge-msg    = {flops_per_step / em:.1f}")
    return flops_per_step, bytes_per_step, em


if __name__ == "__main__":
    args = sys.argv[1:]
    model = "flagship"
    if "--model" in args:
        i = args.index("--model")
        model = args[i + 1]
        args = args[:i] + args[i + 2:]
    batches = [int(b) for b in args] or [1024, 4096]
    for b in batches:
        for dt in ("float32", "bfloat16"):
            accounting(b, dt, model=model)
