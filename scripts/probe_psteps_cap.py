"""Hardware validation of PSTEPS_NODE_CAP (VERDICT r3 item 4): patches
the cap up and drives the per-step kernel at batch 4096 (~53k padded
nodes) for train AND eval, printing edge-msgs/s on success. Run detached
(setsid), never under `timeout`; poll the log. If the monolithic compile
wedges the tunnel (>25 min, no socket), the cap stays at its
interpret-validated value and the bound is recorded as compile-tunnel
rather than VMEM.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import mpnn_tpu.models.fused_train as ft

ft.PSTEPS_NODE_CAP = 65536
import bench

v, e, l = bench.bench_sparse(4096, 1, model="encoded", fuse_step=True,
                             steps_per_call=50)
print(f"[capprobe] encoded train 4096 FUSED ok: {v/1e6:.1f}M edge-msgs/s",
      flush=True)
v2, e2, a2 = bench.bench_eval(4096, 1, model="encoded", steps_per_call=50)
print(f"[capprobe] encoded eval 4096 FUSED ok: {v2/1e6:.1f}M edge-msgs/s",
      flush=True)
