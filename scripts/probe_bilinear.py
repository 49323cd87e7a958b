"""TPU attribution probe for the BILINEAR family (basic_model_ecfp.py
semantics: parameterless bilinear per-edge message from the EVOLVING
state, GRU hidden = initial, concat-state-history readout) — the last
XLA-only row and round-4's slowest family (1.152 ms train / 0.742 eval
at batch 1024). Times the full step against surgical sub-programs so the
cost lands on a component before any kernel work is attempted
(round-5 VERDICT item 4).

    setsid nohup python scripts/probe_bilinear.py [batch] > log 2>&1 &

Sections:
  full        the production train step (fwd + bwd + Adam)
  vag         value_and_grad only (no optimizer)
  fwd         forward only
  msg2        2× sparse_bilinear fwd+bwd alone (gather + einsum chain +
              segment_sum, both steps)
  gsc         the gather/scatter skeleton alone (einsums replaced by a
              src*dst elementwise product — isolates TPU gather/scatter
              from the bilinear chain math)
  gru+ro      recurrence + concat-history readout alone (messages
              replaced by a constant)
"""
import functools, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
import optax
import bench as B
from mpnn_tpu import graphs as G, models
from mpnn_tpu.models.sparse import (sparse_bilinear, sparse_mpnn_apply,
                                    sparse_graph_level_output)
from mpnn_tpu.train.optim import adam

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
gs, ge = B.build_batch(batch)
cfg = B.bilinear_mpnn_cfg(ge)
params, state = models.mpnn_init(jax.random.PRNGKey(317), cfg)
packed = G.collate_packed(gs).as_dict()
nf3 = cfg.node_features ** 3
ef = packed["edge_feats"]
if ef.shape[-1] < nf3:
    ef = np.pad(ef, ((0, 0), (0, nf3 - ef.shape[-1])))
packed["edge_feats"] = ef[:, :nf3]
# bench_sparse's width shim: truncate node features to the config's nf
packed["node_feats"] = np.concatenate(
    [packed["node_feats"], packed["node_nafm"]],
    axis=-1)[:, :cfg.node_features]
jb = {k: jnp.asarray(v) if not np.isscalar(v) else v
      for k, v in packed.items()}
real_edges = int(packed["edge_mask"].sum())
n = packed["node_feats"].shape[0]
nf = cfg.node_features
labels0 = jnp.asarray(np.random.RandomState(0).randn(
    packed["graph_mask"].shape[0]).astype(np.float32))
gm = jb["graph_mask"][:, None]
tx = adam(1e-3)
SPC = 200
nf0 = jb["node_feats"]


def _b(it, k):
    b = dict(jb)
    b["node_feats"] = nf0 * (1.0 + 1e-6 * (it * SPC + k))
    return b


def time_train(name, loss_fn, with_opt=True):
    opt_state = tx.init(params)

    @jax.jit
    def multi(p, s, o, it):
        def body(carry, k):
            p, s, o = carry
            labels = labels0 + 1e-4 * (it * SPC + k)
            (l, ns), g = jax.value_and_grad(loss_fn, has_aux=True)(
                p, s, _b(it, k), labels)
            if with_opt:
                up, o2 = tx.update(g, o, p)
                return (optax.apply_updates(p, up), ns, o2), l
            return (p, ns, o), l
        (_, _, _), ls = jax.lax.scan(body, (p, s, o), jnp.arange(SPC))
        return ls[-1]

    l = multi(params, state, opt_state, jnp.int32(0))
    jax.device_get(l)
    t0 = time.perf_counter()
    for i in range(3):
        l = multi(params, state, opt_state, jnp.int32(i + 1))
    lv = float(jax.device_get(l))
    dt = time.perf_counter() - t0
    ms = dt / (3 * SPC) * 1e3
    eps = real_edges * cfg.message_steps * 3 * SPC / dt
    print(f"{name}: {ms:.3f} ms/step  {eps/1e6:.1f}M edge-msgs/s "
        f"(val {lv:.4f})", flush=True)


def time_fwd(name, fwd):
    @jax.jit
    def multi(p, s, it):
        def body(_, k):
            return 0.0, jnp.sum(fwd(p, s, _b(it, k)))
        _, os_ = jax.lax.scan(body, 0.0, jnp.arange(SPC))
        return os_[-1]

    o = multi(params, state, jnp.int32(0))
    jax.device_get(o)
    t0 = time.perf_counter()
    for i in range(3):
        o = multi(params, state, jnp.int32(i + 1))
    ov = float(jax.device_get(o))
    dt = time.perf_counter() - t0
    print(f"{name}: {dt / (3 * SPC) * 1e3:.3f} ms/step (sum {ov:.4f})",
          flush=True)


def full_loss(p, s, b, labels):
    out, ns = sparse_mpnn_apply(p, s, cfg, b, training=True)
    per = ((out - labels[:, None]) ** 2) * gm
    return per.sum() / gm.sum(), ns


def msg2_loss(p, s, b, labels):
    h = b["node_feats"] * b["node_mask"]
    e = b["edge_feats"] * b["edge_mask"][:, None]
    m1 = sparse_bilinear(h, e, b["edge_src"], b["edge_dst"], nf=nf)
    m2 = sparse_bilinear(h + m1, e, b["edge_src"], b["edge_dst"], nf=nf)
    return (m2 ** 2).sum() * 1e-6 + labels.sum() * 0.0, s


def gsc_loss(p, s, b, labels):
    h = b["node_feats"] * b["node_mask"]

    def skel(hh):
        hs = hh[b["edge_src"]]
        hd = hh[b["edge_dst"]]
        return jax.ops.segment_sum(hs * hd, b["edge_dst"],
                                   num_segments=n)
    m1 = skel(h)
    m2 = skel(h + m1)
    return (m2 ** 2).sum() * 1e-6 + labels.sum() * 0.0, s


def gru_ro_loss(p, s, b, labels):
    from mpnn_tpu.ops.update import gru_apply
    h0 = b["node_feats"] * b["node_mask"]
    msgs = h0 * 0.25 + 0.1 * b["node_mask"]   # constant stand-in
    hist = [h0]
    h = h0
    for _ in range(cfg.message_steps):
        h = gru_apply(p["gru"], msgs, h0, b["node_mask"])
        hist.append(h)
    ro_in = jnp.concatenate(hist, axis=-1)
    out = sparse_graph_level_output(
        p["readout"], ro_in, b["node_mask"], b["node_graph"],
        labels.shape[0])
    per = ((out - labels[:, None]) ** 2) * gm
    return per.sum() / gm.sum(), s


print(f"[probe_bilinear] batch={batch} edges={real_edges} n={n} "
      f"dev={jax.devices()}", flush=True)
time_train("full train step (Adam)", full_loss)
time_train("value_and_grad only  ", full_loss, with_opt=False)
time_fwd("forward only         ",
         lambda p, s, b: sparse_mpnn_apply(p, s, cfg, b,
                                           training=True)[0])
time_fwd("forward only (eval)  ",
         lambda p, s, b: sparse_mpnn_apply(p, s, cfg, b,
                                           training=False)[0])
time_train("msg2 fwd+bwd alone   ", msg2_loss, with_opt=False)
time_train("gather/scatter alone ", gsc_loss, with_opt=False)
time_train("gru+readout alone    ", gru_ro_loss, with_opt=False)
