#!/bin/bash
# Round-4 measurement sweep, take 3. att train rows beyond batch 1024 are
# EXCLUDED: their monolithic Mosaic compile (set2vec unrolls steps x
# graph-blocks) exceeds the compile tunnel's request timeout (>60 min at
# batch 2048) and the response is silently lost — the fori_loop rework
# compiled standalone but wedged inside the scanned train program
# (honest negative, see BASELINE.md round 4). Run detached (NO timeout
# wrappers):  setsid bash scripts/measure_r4c.sh &   Stop by exact PID.
cd /root/repo
LOG=/tmp/measure_r4c.log
echo "=== r4c sweep (take 3) start $(date) ===" >> $LOG
run() {
  echo "--- $* $(date +%H:%M:%S)" >> $LOG
  python bench.py "$@" >> $LOG 2>&1
  echo "--- done rc=$? $(date +%H:%M:%S)" >> $LOG
}
# att family regression at 1024 under the r4 harness (round-3 kernels)
run --model att --batch 1024 --iters 4
run --mode eval --model att --batch 1024 --iters 4
# newly-fused family shapes at 1024
run --model basic --batch 1024 --iters 4
run --mode eval --model basic --batch 1024 --iters 4
run --model graph_norm --batch 1024 --iters 4
run --mode eval --model graph_norm --batch 1024 --iters 4
run --model att_model --batch 1024 --iters 4
run --mode eval --model att_model --batch 1024 --iters 4
run --model bilinear --batch 1024 --iters 4
run --mode eval --model bilinear --batch 1024 --iters 4
# ECFP rows
run --model encoded_ecfp --batch 1024 --iters 4
run --mode eval --model encoded_ecfp --batch 1024 --iters 4
# att serving at scale (fwd-only program, much smaller compile): attempt
run --mode eval --model att --batch 2048 --iters 2
# leave the cache warm on the driver's default shape
run --batch 1024 --iters 2
echo "=== r4c sweep (take 3) end $(date) ===" >> $LOG
