#!/bin/bash
# Round-end measurement sweep on the free TPU chip (run on a QUIET chip;
# two TPU clients contend on the tunnel and corrupt timings).
# Ordered headline-first so a truncated window still leaves the numbers
# that matter most (VERDICT r3 #4: round 3 ended with NO bench output).
# Usage: bash tools/round_end_bench.sh | tee /tmp/round_end_bench.log
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}

echo "=== end-to-end bench.py (defaults — the recorded headline number)"
timeout 900 python -u bench.py

echo "=== serving latency table (batch 1/8/64/512, sync + depth-2 stream)"
timeout 900 python -u benchmarks/bench_serving.py

echo "=== LM stacked-KNN step A/B: one-hot matmul gather vs take_along_axis"
timeout 900 python -u benchmarks/bench_lm_step.py --batch 64
CHECKERPOSE_ONEHOT_GATHER=0 timeout 900 python -u benchmarks/bench_lm_step.py --batch 64
echo "--- single-object reference point (same shapes, static knn)"
timeout 900 python -u benchmarks/bench_train_step.py --batch 64

echo "=== e2e bench.py: pipeline-depth sweep (VERDICT r2 weak 1 attribution)"
for d in 1 2 3 4 6; do
  echo "--- BENCH_DEPTH=$d"
  BENCH_DEPTH=$d timeout 600 python -u bench.py
done

echo "=== e2e bench.py: EdgeConv A/B at the best depth"
echo "--- fused Pallas EdgeConv OFF (XLA split-matmul)"
CHECKERPOSE_FUSED_EDGECONV=0 timeout 600 python -u bench.py

# (session 7) the AUTO-calibrated adaptive official test leg was removed:
# chain_r4b's stage-1 cutover already produces eval_output_synth_r4/
# latest_adaptive with NO --decode_conf_tau (= auto-calibration, the
# VERDICT r3 #6 artifact); repeating it here cost up to 30 min of the
# 75-min bench window that the LM proof needs.

echo "=== forward path + roofline (batch 256 and 512)"
timeout 900 python -u benchmarks/bench_forward.py --batch 256
timeout 900 python -u benchmarks/bench_forward.py --batch 512

echo "=== solver profile sweep (batch 64, N=512)"
timeout 900 python -u benchmarks/bench_solver.py --batch 64 --num_hyp 128
timeout 900 python -u benchmarks/bench_solver.py --batch 64 --num_hyp 64
timeout 900 python -u benchmarks/bench_solver.py --batch 64 --num_hyp 64 --refine_iters 5 \
  --no_reseed --n_backtrack 2
timeout 900 python -u benchmarks/bench_solver.py --batch 64 --num_hyp 64 --refine_iters 5 \
  --no_reseed --n_backtrack 2 --irls_rounds 1

echo "=== bench sweep complete"
