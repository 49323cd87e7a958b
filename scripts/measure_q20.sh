#!/bin/bash
# Post-recovery measurement sweep (q20): run AFTER scripts/
# tpu_recover_watch.sh reports RECOVERED (default bench cache warm).
# Each step is timeout-bounded; results append to /tmp/q20.log.
cd /root/repo || exit 1
log=/tmp/q20.log
run() {
    echo "=== $* $(date -u +%H:%M:%S)" >> "$log"
    timeout 1500 python bench.py "$@" >> "$log" 2>&1
}
run --iters 6                                   # default (combined bwd)
run --iters 4 --batch 2048                      # combined bwd at 26k nodes
run --iters 6 --model ggnn                      # ggnn via fused step
run --iters 3 --model att                       # att XLA default (re-warm)
run --iters 3 --model att --spmm kernel         # TRANSPOSED sddmm
run --iters 4 --mode eval                       # serving: fused eval kernel
run --iters 4 --mode eval --no-fuse-step        # serving: XLA eval
run --iters 4 --mode eval --model ggnn
run --iters 2 --batch 4096                      # decomposed fallback check
echo "=== done $(date -u +%H:%M:%S)" >> "$log"
