#!/bin/bash
# Round-4 measurement sweep on the 1x v5e (sequential; one JSON line per
# config into the log). Re-warms the persistent compile cache as it goes.
cd /root/repo
LOG=/tmp/measure_r4.log
echo "=== sweep start $(date) ===" >> $LOG
run() {
  echo "--- $* $(date +%H:%M:%S)" >> $LOG
  python bench.py "$@" >> $LOG 2>&1
  echo "--- done rc=$? $(date +%H:%M:%S)" >> $LOG
}
# flagship regression (also the driver's end-of-round default shape)
run --batch 1024 --iters 4
run --mode eval --batch 1024 --iters 4
# encoded family train + serving, 1024/2048
run --model encoded --batch 1024 --iters 4
run --model encoded --batch 2048 --iters 2
run --mode eval --model encoded --batch 1024 --iters 4
run --mode eval --model encoded --batch 2048 --iters 2
# att family scaling rows (1024 = round-3 regression, 2048/4096 new)
run --model att --batch 1024 --iters 4
run --model att --batch 2048 --iters 2
run --model att --batch 4096 --iters 1
run --mode eval --model att --batch 2048 --iters 2
run --mode eval --model att --batch 4096 --iters 1
# newly-fused shapes
run --model att_model --batch 1024 --iters 4
run --mode eval --model att_model --batch 1024 --iters 4
run --model basic --batch 1024 --iters 4
run --mode eval --model basic --batch 1024 --iters 4
run --model graph_norm --batch 1024 --iters 4
run --mode eval --model graph_norm --batch 1024 --iters 4
run --model bilinear --batch 1024 --iters 4
run --mode eval --model bilinear --batch 1024 --iters 4
echo "=== sweep end $(date) ===" >> $LOG
