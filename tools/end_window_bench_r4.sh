#!/bin/bash
# Session-9 recovery sweep: the chain_r4d short bench lost all four legs to
# cold TPU compiles exceeding the compressed 420/600 s caps (and block-
# buffered stdout lost even partial progress — fixed with -u everywhere).
# This rerun is scheduled in the post-test_lm window when (a) the chip is
# quiet and (b) the LM proof has warmed the LM train-step compile cache.
# Ordered by information value; each leg checks the wall guard first.
# Usage: GUARD=<epoch> bash tools/end_window_bench_r4.sh >> logs/round_end_bench_r4.log 2>&1
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
GUARD=${GUARD:-1787227020}   # 11:57 UTC default

leg() {  # leg <seconds> <desc> <cmd...>
  local secs=$1 desc=$2; shift 2
  if [ "$(date -u +%s)" -ge "$GUARD" ]; then
    echo "=== guard hit — skipping: $desc"; return 0
  fi
  echo "=== $desc ($(date -u +%H:%M:%S))"
  timeout "$secs" "$@"
  echo "--- rc=$? ($(date -u +%H:%M:%S))"
}

leg 900 "LM step A/B: one-hot matmul gather (default)" \
  python -u benchmarks/bench_lm_step.py --batch 64
leg 900 "LM step A/B: take_along_axis gather (opt-out)" \
  env CHECKERPOSE_ONEHOT_GATHER=0 python -u benchmarks/bench_lm_step.py --batch 64
leg 900 "serving latency table" python -u benchmarks/bench_serving.py
leg 900 "e2e headline bench.py" python -u bench.py
leg 600 "single-object step reference" python -u benchmarks/bench_train_step.py --batch 64
echo "=== end-window sweep complete ($(date -u +%H:%M:%S))"
