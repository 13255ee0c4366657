#!/bin/bash
# Round-5 quiet-window sweep (VERDICT r4 items 4/5/6 + owed verification),
# launched the moment the LM chain releases the chip. Bank-early ordering:
# chip benches first (serving table is the 3-round-old debt), then the
# CPU-side graft-entry/multichip validation, then the full test suite.
# Every leg has its own generous cap, python -u, incremental output, and
# continues on failure. ~75-95 min total.
#
#   nohup setsid bash tools/quiet_window_r5.sh > logs/quiet_window_r5.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
stamp() { echo "=== [$(date -u +%H:%M:%S)] $*"; }

stamp "serving table (batch 1/8/64/512, sync + stream)"
timeout 1500 python -u benchmarks/bench_serving.py || echo "serving leg FAILED rc=$?"

stamp "LM A/B amortized: one-hot leg"
timeout 1200 python -u benchmarks/bench_lm_step.py --batch 64 \
  || echo "lm onehot leg FAILED rc=$?"
stamp "LM A/B amortized: take_along leg"
CHECKERPOSE_ONEHOT_GATHER=0 timeout 1200 python -u benchmarks/bench_lm_step.py --batch 64 \
  || echo "lm take_along leg FAILED rc=$?"

if [ "${QW_SKIP_EXTRA:-0}" != "1" ]; then
  stamp "SO train-step reference (batch 64)"
  timeout 900 python -u benchmarks/bench_train_step.py --batch 64 \
    || echo "so step leg FAILED rc=$?"

  stamp "headline e2e bench (bench.py)"
  timeout 1200 python -u bench.py || echo "bench.py leg FAILED rc=$?"
fi

[ "${QW_SKIP_GRAFT:-0}" = "1" ] && { stamp "graft+pytest skipped (QW_SKIP_GRAFT)"; exit 0; }
stamp "graft entry: single-chip compile check + multichip full legs (CPU)"
CHECKERPOSE_DRYRUN_BUDGET_S=1800 timeout 2400 python -u __graft_entry__.py \
  || echo "graft leg FAILED rc=$?"
# refresh the cache seed with any NEW big entries (eval program etc.)
python - <<'EOF'
import os, shutil
cache, seed = "/root/.cache/jax_comp_cache", "tools/dryrun_cache_seed"
if os.path.isdir(cache):
    for f in os.listdir(cache):
        src = os.path.join(cache, f)
        dst = os.path.join(seed, f)
        if (f.endswith("-cache") and not os.path.exists(dst)
                and os.path.getsize(src) > 4_000_000):
            shutil.copyfile(src, dst)
            print("seeded", f, os.path.getsize(src))
EOF

if [ "${QW_SKIP_PYTEST:-0}" != "1" ]; then
  stamp "full pytest"
  nice -n 10 timeout 3600 python -m pytest tests/ -x -q 2>&1 | tail -5
fi

stamp "QUIET WINDOW SWEEP DONE"
