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

echo "=== end-to-end bench.py"
python bench.py
