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
run --iters 6                                   # default (re-confirm)
run --iters 4 --batch 2048                      # new vmem bwd at nb=2? (fits)
run --iters 2 --batch 4096                      # fused-step cap raise check
run --iters 6 --model ggnn                      # ggnn via fused step
run --iters 3 --model att                       # att XLA default (re-warm)
run --iters 3 --model att --spmm kernel         # transposed sddmm
run --iters 4 --mode eval                       # serving fwd-only
run --iters 4 --mode eval --model att
echo "=== done $(date -u +%H:%M:%S)" >> "$log"
