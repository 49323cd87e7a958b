#!/bin/bash
# Round-4 follow-up sweep: waits for measure_r4.sh (PID $1) to finish,
# then records the ECFP rows and hardware-validates PSTEPS_NODE_CAP at
# 53k padded nodes (VERDICT item 4) by patching the cap in-process.
cd /root/repo
LOG=/tmp/measure_r4b.log
WAIT_PID=${1:-0}
if [ "$WAIT_PID" != "0" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
echo "=== follow-up sweep start $(date) ===" >> $LOG
run() {
  echo "--- $* $(date +%H:%M:%S)" >> $LOG
  python bench.py "$@" >> $LOG 2>&1
  echo "--- done rc=$? $(date +%H:%M:%S)" >> $LOG
}
run --model encoded_ecfp --batch 1024 --iters 4
run --mode eval --model encoded_ecfp --batch 1024 --iters 4

echo "--- psteps cap probe $(date +%H:%M:%S)" >> $LOG
python - >> $LOG 2>&1 <<'PYEOF'
# Does the per-step kernel compile + run at 53k padded nodes (batch 4096)?
# PSTEPS_NODE_CAP is 32768 (interpret-validated only); patch it up and
# drive the real kernel so the cap can be raised from measurement.
import mpnn_tpu.models.fused_train as ft
ft.PSTEPS_NODE_CAP = 65536
import bench
v, e, l = bench.bench_sparse(4096, 1, model="encoded", fuse_step=True,
                             steps_per_call=50)
print(f"[capprobe] encoded train 4096 FUSED ok: {v:.1f} edge-msgs/s")
v2, e2, a2 = bench.bench_eval(4096, 1, model="encoded", steps_per_call=50)
print(f"[capprobe] encoded eval 4096 FUSED ok: {v2:.1f} edge-msgs/s")
PYEOF
echo "--- cap probe done rc=$? $(date +%H:%M:%S)" >> $LOG
echo "=== follow-up sweep end $(date) ===" >> $LOG
