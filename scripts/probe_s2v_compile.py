"""Compile-time probe for the set2vec kernel alone (no att kernel, no
step machinery): times the remote Mosaic compile of the fwd-only op and
then of fwd+bwd at a bench-like shape. Used to isolate the att-family
compile wedge (unrolled form: >60 min at batch 2048; fori_loop form:
suspect at batch 1024). Run detached:
    setsid python scripts/probe_s2v_compile.py <n> <G> > /tmp/s2v_probe.log 2>&1 &
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from mpnn_tpu.kernels.set2vec import make_set2vec_op

n = int(sys.argv[1]) if len(sys.argv) > 1 else 13184
G = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
T = int(sys.argv[3]) if len(sys.argv) > 3 else 12
w = 20
rs = np.random.RandomState(0)
node_graph = np.sort(rs.randint(0, G, n)).astype(np.int32)
x = jnp.asarray(rs.randn(n, w).astype(np.float32))
mask = jnp.ones((n, 1), jnp.float32)
# window starts per 128-graph block (mirrors attach_fused_plan's fs_ns)
gb = (G + 127) // 128
starts = []
for j in range(gb):
    first = np.searchsorted(node_graph, j * 128)
    starts.append((first // 128) * 128)
ns = jnp.asarray(np.asarray(starts, np.int32))
rp = {"lstm": {k: jnp.asarray(rs.randn(*s).astype(np.float32)) * 0.2
               for k, s in [("w_hi", (2*w, w)), ("w_hf", (2*w, w)),
                            ("w_hg", (2*w, w)), ("w_ho", (2*w, w)),
                            ("b_hi", (1, w)), ("b_hf", (1, w)),
                            ("b_hg", (1, w)), ("b_ho", (1, w))]},
      "q_attn": {"w": jnp.asarray(rs.randn(w, w).astype(np.float32)) * 0.2},
      "e_attn": {"w": jnp.asarray(rs.randn(w, 1).astype(np.float32)) * 0.2}}
op = make_set2vec_op(w, n, G, time_steps=T)
ng = jnp.asarray(node_graph)

print(f"[probe] n={n} G={G} gb={gb} T={T} dev={jax.devices()}", flush=True)
t0 = time.time()
fwd = jax.jit(lambda rp, x: jnp.sum(op(rp, x, mask, ng, ns)))
v = jax.device_get(fwd(rp, x))
print(f"[probe] FWD compile+run {time.time()-t0:.1f}s value {v:.4f}", flush=True)
t0 = time.time()
g = jax.jit(jax.grad(lambda rp, x: jnp.sum(op(rp, x, mask, ng, ns) ** 2),
                     argnums=(0, 1)))
gv = jax.device_get(g(rp, x))
print(f"[probe] FWD+BWD compile+run {time.time()-t0:.1f}s "
      f"leaves {len(jax.tree.leaves(gv))}", flush=True)
