"""Attribution probe for the ECFP per-graph label aggregate s1:
times (a) jax.ops.segment_sum on the (nodes, 16384) bit matrix and
(b) the block-windowed one-hot MATMUL formulation (128-graph blocks,
static windows from the fused-step plan) on the real chip. 50 reps per
dispatch, anti-replay input perturbation. Run detached (setsid)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
import bench as B
from mpnn_tpu import graphs as G
from mpnn_tpu.kernels.fused_step import attach_fused_plan

BITS = 16384
gs, ge = B.build_batch(1024)
packed = G.collate_packed(gs).as_dict()
packed = G.attach_edge_vocab(packed, vocab_cap=16)
packed = attach_fused_plan(packed, block_edges=512)
ng_np = np.asarray(packed["node_graph"])
n = ng_np.shape[0]
n_graphs = packed["graph_mask"].shape[0]
rs = np.random.RandomState(1)
bits = jnp.asarray((rs.rand(n, BITS) < 0.02).astype(np.uint8)
                   * np.asarray(packed["node_mask"]).astype(np.uint8))
ng = jnp.asarray(ng_np)
ns_list = [int(v) for v in np.asarray(packed["fs_ns"])]
gb = len(ns_list)
nw = min(2048, ((n + 127) // 128) * 128)
print(f"[probe] n={n} G={n_graphs} gb={gb} nw={nw}", flush=True)


def timeit(name, fn):
    f = jax.jit(fn)
    r = jax.device_get(f(jnp.float32(0.0)))
    t0 = time.perf_counter()
    for i in range(3):
        r = f(jnp.float32(i + 1.0))
    s = float(jax.device_get(r))
    dt = (time.perf_counter() - t0) / (3 * 50) * 1e3
    print(f"[{name}] {dt:.3f} ms/rep (check {s:.1f})", flush=True)


def seg_sum(c):
    def body(acc, k):
        y = bits.astype(jnp.float32) + 0.0 * (c + k)   # anti-replay dep
        s1 = jax.ops.segment_sum(y, ng, num_segments=n_graphs,
                                 indices_are_sorted=True)
        return acc + s1.sum(), 0.0
    acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(50.0))
    return acc


def blk_matmul(c):
    def body(acc, k):
        s1 = jnp.zeros((n_graphs, BITS), jnp.float32)
        for j, ns in enumerate(ns_list):
            w = min(nw, n - ns)
            ogT = (jnp.arange(j * 128, (j + 1) * 128)[:, None]
                   == ng[ns:ns + w][None, :]).astype(jnp.float32)
            yw = bits[ns:ns + w].astype(jnp.float32) + 0.0 * (c + k)
            s1 = s1.at[j * 128:(j + 1) * 128].add(ogT @ yw)
        return acc + s1.sum(), 0.0
    acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(50.0))
    return acc


timeit("segment_sum ", seg_sum)
timeit("block-matmul", blk_matmul)
