"""TPU timing probe for the per-step (encoded-family) fused kernel:
the encoded config at bench scale, fused psteps kernel vs the XLA
sparse path (anti-replay, steps batched per dispatch).

    python scripts/probe_psteps.py [batch] [train|eval]

eval mode times the SERVING path: make_fused_psteps_eval_op (per-step
BNs folded to per-step affines, ONE launch) vs the XLA sparse eval."""
import functools, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
import optax
import bench as B
from mpnn_tpu import graphs as G, models
from mpnn_tpu.kernels.fused_step import attach_fused_plan
from mpnn_tpu.models.fused_train import (fused_step_eligible,
                                         make_fused_step_for_batch,
                                         fused_psteps_apply)
from mpnn_tpu.models.sparse import sparse_mpnn_apply
from mpnn_tpu.train.optim import adam

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
gs, ge = B.build_batch(batch)
enc = 8
cfg = models.MPNNConfig(
    node_features=enc, edge_features=2, message_features=enc,
    output_dim=2 * enc, message_steps=3,
    share_message_weights=False, per_step_norms=True,
    msg_norm="bn1d", state_norm="bn1d",
    atom_encoder="atom_ae", atom_encoder_in=ge.atom_width() + 3,
    bond_encoder="bond_ae", bond_encoder_in=ge.bond_width(),
    input_norm=True, edge_mlp_tail_repeats=50)
params, state = models.mpnn_init(jax.random.PRNGKey(317), cfg)
packed = G.attach_edge_vocab(G.collate_packed(gs).as_dict(), vocab_cap=16)
packed = attach_fused_plan(packed)
assert "fs_win" in packed
packed["node_feats"] = np.concatenate(
    [packed["node_feats"], packed["node_nafm"]], axis=-1)
jb = {k: jnp.asarray(v) if not np.isscalar(v) else v
      for k, v in packed.items()}
assert fused_step_eligible(cfg, jb, training=True)
op = make_fused_step_for_batch(cfg, jb)
real_edges = int(packed["edge_mask"].sum())
labels0 = jnp.asarray(np.random.RandomState(0).randn(
    packed["graph_mask"].shape[0]).astype(np.float32))
tx = adam(1e-3, weight_decay=1e-4)
SPC = 200

def timeit(name, loss_fn):
    opt_state = tx.init(params)
    @functools.partial(jax.jit, donate_argnums=())
    def multi(p, s, o, it):
        def body(carry, k):
            p, s, o = carry
            labels = labels0 + 1e-4 * (it * SPC + k)
            (l, ns), g = jax.value_and_grad(loss_fn, has_aux=True)(p, s, labels)
            up, o2 = tx.update(g, o, p)
            return (optax.apply_updates(p, up), ns, o2), l
        (_, _, _), ls = jax.lax.scan(body, (p, s, o), jnp.arange(SPC))
        return ls[-1]
    l = multi(params, state, opt_state, jnp.int32(0)); jax.device_get(l)
    t0 = time.perf_counter()
    for i in range(3):
        l = multi(params, state, opt_state, jnp.int32(i + 1))
    lv = float(jax.device_get(l)); dt = time.perf_counter() - t0
    ms = dt / (3 * SPC) * 1e3
    eps = real_edges * cfg.message_steps * 3 * SPC / dt
    print(f"{name}: {ms:.3f} ms/step  {eps/1e6:.1f}M edge-msgs/s "
          f"(loss {lv:.4f})", flush=True)

gm = jb["graph_mask"][:, None]
mode = sys.argv[2] if len(sys.argv) > 2 else "train"

if mode == "eval":
    from mpnn_tpu.models.fused_train import (fused_eval_eligible,
                                             make_fused_eval_for_batch,
                                             fused_mpnn_eval)
    assert fused_eval_eligible(cfg, jb)
    eval_op = make_fused_eval_for_batch(cfg, jb)
    nf0 = jb["node_feats"]

    def time_eval(name, fwd):
        @jax.jit
        def multi(p, s, it):
            def body(_, k):
                b = dict(jb)
                # anti-replay: perturb the raw node features per step
                b["node_feats"] = nf0 * (1.0 + 1e-6 * (it * SPC + k))
                return 0.0, jnp.sum(fwd(p, s, b))
            _, os_ = jax.lax.scan(body, 0.0, jnp.arange(SPC))
            return os_[-1]
        o = multi(params, state, jnp.int32(0)); jax.device_get(o)
        t0 = time.perf_counter()
        for i in range(3):
            o = multi(params, state, jnp.int32(i + 1))
        ov = float(jax.device_get(o)); dt = time.perf_counter() - t0
        ms = dt / (3 * SPC) * 1e3
        eps = real_edges * cfg.message_steps * 3 * SPC / dt
        print(f"{name}: {ms:.3f} ms/step  {eps/1e6:.1f}M edge-msgs/s "
              f"(sum {ov:.4f})", flush=True)

    time_eval("encoded psteps fused EVAL",
              lambda p, s, b: fused_mpnn_eval(p, s, cfg, b, eval_op))
    time_eval("encoded XLA sparse  EVAL",
              lambda p, s, b: sparse_mpnn_apply(p, s, cfg, b,
                                                training=False)[0])
elif mode == "parts":
    # attribution: train-forward only (stats+stash, no bwd) vs
    # value_and_grad (no optimizer) vs the full Adam step — where do the
    # 2.21 ms go when the same edge work serves in 0.187 ms?
    # Anti-LICM: params/state are loop-constant here (no optimizer), so
    # the XLA prologue would hoist out of the scan and understate the
    # per-step cost — perturb the batch's node features per iteration
    # (the eval-mode discipline) so the whole chain re-runs each step.
    nf0 = jb["node_feats"]

    def _b(it, k):
        b = dict(jb)
        b["node_feats"] = nf0 * (1.0 + 1e-6 * (it * SPC + k))
        return b

    def fwd_only(p, s, labels, b):
        loss, out, ns = fused_psteps_apply(p, s, cfg, b, op,
                                           labels=labels)
        return loss

    def time_fn(name, fn):
        @jax.jit
        def multi(p, s, it):
            def body(_, k):
                labels = labels0 + 1e-4 * (it * SPC + k)
                return 0.0, fn(p, s, labels, _b(it, k))
            _, ls = jax.lax.scan(body, 0.0, jnp.arange(SPC))
            return ls[-1]
        l = multi(params, state, jnp.int32(0)); jax.device_get(l)
        t0 = time.perf_counter()
        for i in range(3):
            l = multi(params, state, jnp.int32(i + 1))
        lv = float(jax.device_get(l)); dt = time.perf_counter() - t0
        print(f"{name}: {dt / (3 * SPC) * 1e3:.3f} ms/step "
              f"(val {lv:.4f})", flush=True)

    def vag(p, s, labels, b):
        def lf(pp):
            loss, out, ns = fused_psteps_apply(pp, s, cfg, b, op,
                                               labels=labels)
            return loss
        l, g = jax.value_and_grad(lf)(p)
        return l + jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x), g, 0.0)

    # isolate the PALLAS bwd from the XLA prologue bwd: grad of the op
    # alone over pre-built kernel inputs (amat/a0/mbias/h0 as leaves)
    from mpnn_tpu.models.fused_train import (_build_a_form_psteps,
                                             _input_transforms)
    h0c, efc, _ = _input_transforms(params, state, cfg, jb, training=True)
    amatc, a0c, mbiasc, vidc = _build_a_form_psteps(params, cfg, jb, efc)
    kern_inputs = (amatc, a0c, mbiasc, h0c, params["gru"],
                   params["ma_bn"], params["bn"], params["readout"])

    def vag_kernel(p, s, labels, b):
        # the prologue inputs are DELIBERATELY loop-constant here (that is
        # the kernel-only isolation); the per-iteration labels feed the op
        # directly, so the pallas fwd+bwd themselves cannot be hoisted
        def lf(ki):
            amat, a0, mbias, h0, gru, ma, bn, ro = ki
            loss, out, ma_s, bn_s = op(
                amat, a0, mbias, h0, jb["node_mask"], jb["node_graph"],
                gru, ma, bn, ro, labels, jb["graph_mask"], vidc,
                jb["edge_src"], jb["edge_dst"], jb["fs_win"], jb["fs_ns"])
            return loss
        l, g = jax.value_and_grad(lf)(kern_inputs)
        return l + jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x), g, 0.0)

    time_fn("psteps train FWD only     ", fwd_only)
    time_fn("psteps kernel-only v&grad ", vag_kernel)
    time_fn("psteps value_and_grad     ", vag)
else:
    def loss_fused(p, s, labels):
        loss, out, ns = fused_psteps_apply(p, s, cfg, jb, op, labels=labels)
        return loss, ns

    def loss_xla(p, s, labels):
        out, ns = sparse_mpnn_apply(p, s, cfg, jb, training=True)
        per = ((out - labels[:, None]) ** 2) * gm
        return per.sum() / gm.sum(), ns

    timeit("encoded psteps fused", loss_fused)
    timeit("encoded XLA sparse  ", loss_xla)
