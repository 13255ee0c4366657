#!/bin/bash
# Round-2 measurement window: run AFTER the proof run releases the chip.
# Sequential (one TPU client at a time -- concurrent clients contend on the
# tunnel and corrupt timings). Each step logs to logs/perf/.
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
mkdir -p logs/perf

run() {  # run <name> <env...> -- <cmd...>
  local name=$1; shift
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  echo "=== $name (${envs[*]:-no-env})" | tee -a logs/perf/summary.log
  env "${envs[@]}" "$@" 2>&1 | grep -vE "oneDNN|cudart|InitializeLog|xla_bridge|Platform|absl" \
    | tee logs/perf/"$name".log | tail -3 | tee -a logs/perf/summary.log
}

# 1) e2e bench A/B: gated forward variants
run bench_base          -- python bench.py
run bench_bilinmm       CHECKERPOSE_BILINEAR_MATMUL=1 -- python bench.py
run bench_i2f           CHECKERPOSE_I2F_FUSED_GATHER=1 -- python bench.py
run bench_both          CHECKERPOSE_BILINEAR_MATMUL=1 CHECKERPOSE_I2F_FUSED_GATHER=1 -- python bench.py
run bench_fusededge     CHECKERPOSE_FUSED_EDGECONV=1 -- python bench.py
run bench_best_guess    CHECKERPOSE_BILINEAR_MATMUL=1 CHECKERPOSE_I2F_FUSED_GATHER=1 CHECKERPOSE_FUSED_EDGECONV=1 -- python bench.py

# 2) per-segment forward attribution + roofline
run fwd_segments        -- python benchmarks/bench_forward_segments.py --batch 256 --reps 10

echo "=== perf window DONE" | tee -a logs/perf/summary.log
