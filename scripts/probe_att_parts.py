"""Part-selectable att-step compile/timing probe (round 4): isolates
which piece of the fused att train step wedges the compile tunnel.
    python scripts/probe_att_parts.py kernel|readout|full [batch]
Each part is its own jit program: 'kernel' = fused_att payloads only,
'readout' = set2vec kernel inside the readout glue only, 'full' = the
production fused step. Run detached (setsid), never under `timeout`.
"""
import functools, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
import bench as B
from mpnn_tpu import graphs as G
from mpnn_tpu.models import mpnn_init
from mpnn_tpu.models.fused_train import (fused_step_eligible,
                                         make_fused_step_for_batch,
                                         fused_mpnn_out, _build_att_form,
                                         _att_readout)
from mpnn_tpu.kernels.fused_step import attach_fused_plan
from mpnn_tpu.train.optim import adam
import optax

part = sys.argv[1] if len(sys.argv) > 1 else "kernel"
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

gs, ge = B.build_batch(batch)
cfg = B.att_mpnn_cfg(ge)
params, state = mpnn_init(jax.random.PRNGKey(317), cfg)
packed = G.collate_packed(gs).as_dict()
packed = G.attach_edge_vocab(packed, vocab_cap=16)
packed = attach_fused_plan(packed, block_edges=512)
packed["node_feats"] = np.concatenate(
    [packed["node_feats"], packed["node_nafm"]], axis=-1)
jb = {k: jnp.asarray(v) if not np.isscalar(v) else v
      for k, v in packed.items()}
assert fused_step_eligible(cfg, jb, training=True)
op = make_fused_step_for_batch(cfg, jb)
labels0 = jnp.asarray(np.random.RandomState(0).randn(
    packed["graph_mask"].shape[0]).astype(np.float32))
tx = adam(1e-3, weight_decay=1e-4)
SPC = 200
gm = jb["graph_mask"][:, None]


def timeit(name, loss_fn):
    opt_state = tx.init(params)

    @jax.jit
    def multi(params, state, opt_state, it):
        def body(carry, k):
            p, s, o = carry
            labels = labels0 + 1e-4 * (it * SPC + k)
            (l, ns), g = jax.value_and_grad(loss_fn, has_aux=True)(
                p, s, labels)
            up, o2 = tx.update(g, o, p)
            return (optax.apply_updates(p, up), ns, o2), l
        (p, s, o), ls = jax.lax.scan(
            body, (params, state, opt_state), jnp.arange(SPC))
        return ls[-1]

    t0 = time.time()
    l = multi(params, state, opt_state, jnp.int32(0))
    jax.device_get(l)
    print(f"[{name}] compile+first {time.time()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for i in range(3):
        l = multi(params, state, opt_state, jnp.int32(i + 1))
    lv = float(jax.device_get(l))
    dt = time.perf_counter() - t0
    print(f"[{name}] {dt/(3*SPC)*1e3:.3f} ms/step (loss {lv:.3f})",
          flush=True)


def loss_full(p, s, labels):
    out, ns = fused_mpnn_out(p, s, cfg, jb, op)
    per = ((out - labels[:, None]) ** 2) * gm
    return per.sum() / gm.sum(), ns


def loss_kernel_only(p, s, labels):
    h0 = jb["node_feats"] * jb["node_mask"]
    aprime, a0, qv, q0, wh = _build_att_form(p, cfg, jb)
    att_op = op["att"] if isinstance(op, dict) else op
    h = att_op(aprime, a0, qv, q0, wh, h0, jb["node_mask"],
               jb["node_graph"], p["gru"], jb["edge_vid"],
               jb["edge_src"], jb["edge_dst"], jb["fs_win"], jb["fs_ns"])
    return ((h - labels[jnp.clip(jb["node_graph"], 0,
                                 gm.shape[0] - 1), None]) ** 2).mean(), s


def loss_readout_only(p, s, labels):
    h0 = jb["node_feats"] * jb["node_mask"]
    h = h0 * 0.9  # stand-in state, no att kernel
    out = _att_readout(p, cfg, h, h0, jb)
    per = ((out - labels[:, None]) ** 2) * gm
    return per.sum() / gm.sum(), s


print(f"[probe] part={part} batch={batch} dev={jax.devices()}", flush=True)
timeit(part, {"kernel": loss_kernel_only, "readout": loss_readout_only,
              "full": loss_full}[part])
