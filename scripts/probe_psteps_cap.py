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

# 65536 is IMPOSSIBLE for the monolithic psteps backward: at 52,480
# padded nodes the compiler's VMEM need is 183.78 MiB vs the v5e's
# 128 MiB physical capacity; at 33k it is 122.23 MiB vs the 110 MiB
# scoped clamp (round-4 probes) — ~3.7 KiB/node. Validate the lowered
# 28,672 cap by RUNNING it: batch 2176 ≈ 28.2k padded nodes.
import bench

v, e, l = bench.bench_sparse(2176, 1, model="encoded", fuse_step=True,
                             steps_per_call=50)
print(f"[capprobe] encoded train 2176 FUSED ok: {v/1e6:.1f}M edge-msgs/s",
      flush=True)
v2, e2, a2 = bench.bench_eval(2176, 1, model="encoded", steps_per_call=50)
print(f"[capprobe] encoded eval 2176 FUSED ok: {v2/1e6:.1f}M edge-msgs/s",
      flush=True)
