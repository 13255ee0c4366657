#!/bin/bash
# Round-end measurement sweep on the free TPU chip (run AFTER training ends;
# two TPU clients contend on the tunnel and corrupt timings).
# Usage: bash tools/round_end_bench.sh | tee /tmp/round_end_bench.log
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}

echo "=== solver profile sweep (batch 64, N=512)"
python benchmarks/bench_solver.py --batch 64 --num_hyp 128
python benchmarks/bench_solver.py --batch 64 --num_hyp 64
python benchmarks/bench_solver.py --batch 64 --num_hyp 64 --refine_iters 5 \
  --no_reseed --n_backtrack 2
python benchmarks/bench_solver.py --batch 64 --num_hyp 64 --refine_iters 5 \
  --no_reseed --n_backtrack 2 --irls_rounds 1

echo "=== forward path + roofline (batch 256 and 512)"
python benchmarks/bench_forward.py --batch 256
python benchmarks/bench_forward.py --batch 512

echo "=== serving latency table (batch 1/8/64/512, sync + depth-2 stream)"
python benchmarks/bench_serving.py

echo "=== LM stacked-KNN step A/B: one-hot matmul gather vs take_along_axis"
python benchmarks/bench_lm_step.py --batch 64
CHECKERPOSE_ONEHOT_GATHER=0 python benchmarks/bench_lm_step.py --batch 64
echo "--- single-object reference point (same shapes, static knn)"
python benchmarks/bench_train_step.py --batch 64

echo "=== e2e bench.py: pipeline-depth sweep (VERDICT r2 weak 1 attribution)"
for d in 1 2 3 4 6; do
  echo "--- BENCH_DEPTH=$d"
  BENCH_DEPTH=$d python bench.py
done

echo "=== e2e bench.py: EdgeConv A/B at the best depth"
echo "--- fused Pallas EdgeConv OFF (XLA split-matmul)"
CHECKERPOSE_FUSED_EDGECONV=0 python bench.py

echo "=== end-to-end bench.py (defaults — the recorded number)"
python bench.py
