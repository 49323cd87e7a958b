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
           "bilinear": bench.bilinear_mpnn_cfg,
           "graph_norm": bench.graph_norm_mpnn_cfg}[model](ge)
    params, state = models.mpnn_init(jax.random.PRNGKey(317), cfg)
    packed = G.collate_packed(gs).as_dict()
    if model == "ggnn":
        packed = G.with_edge_types(packed, gs)
    if model == "bilinear":
        packed = bench.shim_bilinear_widths(packed, cfg)
    else:
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


def _ru(d: int, m: int = 128) -> int:
    return -(-d // m) * m


def onehot_accounting(batch_size: int, model: str = "flagship"):
    """Per-family ONE-HOT roofline: counts every matmul the fused kernels
    actually issue (hand-transcribed from the kernel sources, file:line
    cited inline) and reports two bounds per section:

      nominal  2·m·k·n over the logical dot shapes — the floor if the
               hardware processed skinny operands at full rate;
      MXU-tile the same dots with every dim rounded up to 128 — the
               ceiling if each dot occupies full 128×128 MXU tiles.

    The true cost sits between the bounds (Mosaic pads the lane dim but
    may lower tiny-k contractions on the VPU), so BASELINE.md quotes the
    bracket, not a point. Backward GRU/BN reverse walks are counted from
    kernels/fused_psteps.py::psteps_reverse_walk:366-397 (18 dots/step);
    the flagship's vmem_reverse_walk and the att GRU backward share that
    structure. set2vec backward is counted as 2× its forward (the bwd
    kernel re-issues each forward dot plus one transpose partner,
    kernels/set2vec.py:181-264)."""
    import bench
    from mpnn_tpu import graphs as G

    W = BE = 512           # window / block_edges (make_fused_step_op)
    NW = 2048              # node_window for graph-block one-hots
    GW = 128               # GRAPH_BLOCK
    K = 16                 # edge vocab cap (bench.py attach_edge_vocab)

    gs, ge = bench.build_batch(batch_size, edge_types=(model == "ggnn"))
    cfg = {"flagship": bench.flagship_mpnn_cfg, "att": bench.att_mpnn_cfg,
           "ggnn": bench.ggnn_mpnn_cfg, "encoded": bench.encoded_mpnn_cfg,
           "att_model": bench.att_model_mpnn_cfg,
           "basic": bench.basic_mpnn_cfg,
           "bilinear": bench.bilinear_mpnn_cfg,
           "graph_norm": bench.graph_norm_mpnn_cfg}[model](ge)
    packed = G.collate_packed(gs).as_dict()
    n_cap = int(packed["node_feats"].shape[0])
    e_cap = int(packed["edge_src"].shape[0])
    ng = int(packed["graph_mask"].shape[0])

    f = cfg.node_features
    kmf = (cfg.ggnn_num_edge_types if model == "ggnn" else K) * f
    T = cfg.message_steps
    od = cfg.output_dim
    npad = _ru(n_cap)
    nblk = -(-e_cap // BE)
    gb = -(-ng // GW)
    gp = gb * GW
    nw = min(NW, npad)

    totals = {}

    def sec(name, dots):
        """dots: list of (mult, m, k, n)."""
        nom = sum(c * 2.0 * m * k * n for c, m, k, n in dots)
        til = sum(c * 2.0 * _ru(m) * _ru(k) * _ru(n) for c, m, k, n in dots)
        totals[name] = (nom, til)

    fam = {"flagship": "step", "ggnn": "step", "basic": "step",
           "encoded": "psteps", "graph_norm": "psteps",
           "att": "att", "att_model": "att_steps",
           "bilinear": "bilinear"}[model]

    if fam == "step":
        # kernels/fused_step.py:259-267 (hs, bulk, me, scatter)
        sec("edge_fwd", [(nblk, f, W, BE), (nblk, kmf, f, BE),
                         (nblk, f, kmf, BE), (nblk, f, BE, W)])
        # fused_step.py:805-817 (gd, bulk2, dhe, dh0, hse, gdr, da2t)
        sec("edge_bwd", [(2 * nblk, f, W, BE), (2 * nblk, kmf, f, BE),
                         (nblk, f, kmf, BE), (nblk, f, BE, W),
                         (nblk, kmf, BE, f)])
        # fused_step.py:276-287 (A0), 324-336 (gates once + GRU per step)
        sec("node_fwd", [(gb, f, nw, GW), (gb, f, GW, nw), (1, f, f, gp),
                         (3, f, f, npad), (3 * T, f, f, npad)])
        # walk 18 dots/step + A0 bwd (fused_step.py:754-796)
        sec("node_bwd", [(18 * T, f, f, npad), (2 * gb, f, nw, GW),
                         (gb, f, GW, nw), (1, f, gp, f), (1, f, f, gp)])
        # fused_step.py:350-362 / 721-751 (gated graph-level readout)
        sec("ro_fwd", [(4 * gb, od, f, nw), (gb, od, nw, GW)])
        sec("ro_bwd", [(4 * gb, od, f, nw), (gb, od, GW, nw),
                       (4 * gb, f, od, nw), (4 * gb, od, nw, f)])
    elif fam == "psteps":
        # fused_psteps.py:146-167 (shared hs gather + per-step tail)
        sec("edge_fwd", [(nblk, f, W, BE), (T * nblk, kmf, f, BE),
                         (T * nblk, f, kmf, BE), (T * nblk, f, BE, W)])
        # fused_psteps.py:566-587
        sec("edge_bwd", [(nblk, f, W, BE), (T * nblk, f, W, BE),
                         (2 * T * nblk, kmf, f, BE), (T * nblk, f, kmf, BE),
                         (T * nblk, f, BE, W), (T * nblk, kmf, BE, f)])
        # fused_psteps.py:170-188 (A0 per step) + 229-240 + GRU
        sec("node_fwd", [(gb, f, nw, GW), (T, f, f, gp),
                         (T * gb, f, GW, nw), (6 * T, f, f, npad)])
        sec("node_bwd", [(18 * T, f, f, npad), (gb, f, nw, GW),
                         (T * gb, f, nw, GW), (T, f, gp, f), (T, f, f, gp),
                         (T * gb, f, GW, nw)])
        sec("ro_fwd", [(4 * gb, od, f, nw), (gb, od, nw, GW)])
        sec("ro_bwd", [(4 * gb, od, f, nw), (gb, od, GW, nw),
                       (4 * gb, f, od, nw), (4 * gb, od, nw, f)])
    elif fam == "att":
        # fused_att.py:96-118 (hd, hs, zh, qv·ohv, bulk, me, corr, scatter)
        sec("edge_fwd", [(2 * nblk, f, W, BE), (2 * nblk, f, f, BE),
                         (nblk, f, K, BE), (nblk, kmf, f, BE),
                         (nblk, f, kmf, BE), (nblk, f, BE, W)])
        # fused_att.py:260-302
        sec("edge_bwd", [(3 * nblk, f, W, BE), (3 * nblk, f, f, BE),
                         (nblk, f, K, BE), (2 * nblk, kmf, f, BE),
                         (nblk, kmf, BE, f), (nblk, f, kmf, BE),
                         (3 * nblk, f, BE, f), (nblk, f, BE, K),
                         (2 * nblk, f, BE, W)])
        # fused_att.py:120-148 (rank-1 corr + gates + ONE GRU app)
        sec("node_fwd", [(gb, f, nw, GW), (gb, f, GW, nw),
                         (2 * gb, f, f, nw), (6, f, f, npad)])
        # fused_att.py:177-258 (GRU bwd + corr bwd)
        sec("node_bwd", [(18, f, f, npad), (2 * gb, f, nw, GW),
                         (2 * gb, f, GW, nw), (3 * gb, f, f, nw),
                         (gb, f, nw, f), (gb, f, nw, GW)])
        w2 = 2 * f
        Ts = cfg.set2vec_steps
        # set2vec.py:91-140 (q, qb, eb, softmax one-hots, mr, 8 LSTM dots)
        sec("s2v_fwd", [(Ts, w2, w2, gp), (Ts * gb, w2, GW, nw),
                        (Ts * gb, 1, w2, nw), (3 * Ts * gb, 1, nw, GW),
                        (Ts * gb, w2, nw, GW), (8 * Ts, w2, w2, gp)])
        nom, til = totals["s2v_fwd"]
        totals["s2v_bwd"] = (2 * nom, 2 * til)
    elif fam == "bilinear":
        f2 = f * f
        kmf2 = K * f2
        # fused_bilinear.py:~100-125 per step (gathers are PER STEP —
        # messages come from the evolving state): hs+hd, φ via f
        # row-embedding matmuls, the A-table bulk, sel, scatter
        sec("edge_fwd", [(2 * T * nblk, f, W, BE),
                         (T * nblk * f, f2, f, BE),
                         (T * nblk, kmf, f2, BE),
                         (T * nblk, f, kmf, BE),
                         (T * nblk, f, BE, W)])
        # fused_bilinear.py:~210-260: gd + hs + hd gathers, a2tt·gd,
        # sel2, f embedding transposes, the two endpoint scatters
        sec("edge_bwd", [(3 * T * nblk, f, W, BE),
                         (T * nblk, kmf2, f, BE),
                         (T * nblk, f2, kmf2, BE),
                         (T * nblk * f, f, f2, BE),
                         (2 * T * nblk, f, BE, W)])
        # GRU fwd gates + internals / bwd walk (readout stays in XLA)
        sec("node_fwd", [(6 * T, f, f, npad)])
        sec("node_bwd", [(18 * T, f, f, npad)])
    else:  # att_steps (att_model)
        # fused_att.py:529-558 (shared hd/hs + per-step tail)
        sec("edge_fwd", [(2 * nblk, f, W, BE), (2 * T * nblk, f, f, BE),
                         (T * nblk, f, K, BE), (T * nblk, kmf, f, BE),
                         (T * nblk, f, kmf, BE), (T * nblk, f, BE, W)])
        # fused_att.py:785-833
        sec("edge_bwd", [(2 * nblk, f, W, BE), (T * nblk, f, W, BE),
                         (4 * T * nblk, f, f, BE), (T * nblk, f, K, BE),
                         (2 * T * nblk, kmf, f, BE), (T * nblk, kmf, BE, f),
                         (T * nblk, f, kmf, BE), (3 * T * nblk, f, BE, f),
                         (T * nblk, f, BE, K), (2 * nblk, f, BE, W)])
        # fused_att.py:590-632
        sec("node_fwd", [(gb, f, nw, GW), (T * gb, f, GW, nw),
                         (2 * T * gb, f, f, nw), (6 * T, f, f, npad)])
        sec("node_bwd", [(18 * T, f, f, npad), (2 * gb, f, nw, GW),
                         (2 * T * gb, f, GW, nw), (3 * T * gb, f, f, nw),
                         (T * gb, f, nw, f), (T * gb, f, nw, GW)])
        w2 = 2 * f
        Ts = cfg.set2vec_steps
        sec("s2v_fwd", [(Ts, w2, w2, gp), (Ts * gb, w2, GW, nw),
                        (Ts * gb, 1, w2, nw), (3 * Ts * gb, 1, nw, GW),
                        (Ts * gb, w2, nw, GW), (8 * Ts, w2, w2, gp)])
        nom, til = totals["s2v_fwd"]
        totals["s2v_bwd"] = (2 * nom, 2 * til)

    print(f"model={model} batch={batch_size} f={f} kmf={kmf} T={T} "
          f"npad={npad} eblocks={nblk} gb={gb}")
    tn = tt = 0.0
    for name, (nom, til) in totals.items():
        tn += nom
        tt += til
        print(f"  {name:10s} nominal {nom / 1e9:7.2f} GF   "
              f"MXU-tile {til / 1e9:7.2f} GF")
    # v5e f32 matmul peak ~49 TF/s (bf16 197/4): the bracket's time floor
    print(f"  {'TOTAL':10s} nominal {tn / 1e9:7.2f} GF   "
          f"MXU-tile {tt / 1e9:7.2f} GF")
    print(f"  floor @49 TF/s f32: nominal {tn / 49e12 * 1e3:.3f} ms  "
          f"MXU-tile {tt / 49e12 * 1e3:.3f} ms")
    return totals


if __name__ == "__main__":
    args = sys.argv[1:]
    model = "flagship"
    onehot = "--onehot" in args
    if onehot:
        args.remove("--onehot")
    if "--model" in args:
        i = args.index("--model")
        model = args[i + 1]
        args = args[:i] + args[i + 2:]
    batches = [int(b) for b in args] or [1024, 4096]
    for b in batches:
        if onehot:
            onehot_accounting(b, model=model)
        else:
            for dt in ("float32", "bfloat16"):
                accounting(b, dt, model=model)
