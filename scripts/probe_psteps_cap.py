"""Hardware validation of PSTEPS_NODE_CAP: drives the per-step kernel at
the requested batch for train AND eval, printing edge-msgs/s on success.
Run detached (setsid), never under `timeout`; poll the log. If a compile
wedges the tunnel (>25 min, no socket), kill the exact PID and record the
bound as compile-tunnel rather than VMEM.

Round-4 history: 65536 was IMPOSSIBLE for the MONOLITHIC psteps backward
(~3.7 KiB/node of live walk temporaries: 183.78 MiB at 52,480 padded
nodes vs the v5e's 128 MiB physical VMEM; 122.23 MiB at 33k vs the
110 MiB scoped clamp) — the cap was lowered to 28672 and validated by
running 28.2k. Round 5 added the node-blocked STREAMING backward
(kernels/fused_psteps.py::_ps_stream_walk_kernel), which removes the
walk's VMEM scaling; this probe now validates the raised cap by running
batch 4096 ≈ 53k padded nodes end to end.

    setsid nohup python scripts/probe_psteps_cap.py [batch] > log 2>&1 &
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096

v, e, l = bench.bench_sparse(batch, 5, model="encoded", fuse_step=True,
                             steps_per_call=50)
print(f"[capprobe] encoded train {batch} FUSED ok: "
      f"{v/1e6:.1f}M edge-msgs/s", flush=True)
v2, e2, a2 = bench.bench_eval(batch, 5, model="encoded", steps_per_call=50)
print(f"[capprobe] encoded eval {batch} FUSED ok: "
      f"{v2/1e6:.1f}M edge-msgs/s", flush=True)
