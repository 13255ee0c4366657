#!/bin/bash
# Round-4 hard-decode solver-knob sweep on the FINAL single-object proof
# checkpoint. Every knob here is a flag the reference's test.py exposes
# (test.py:553-558) — this is a parity-legal sweep of the solver work/
# threshold space under the reference's own decode (hard), to report the
# best reference-recipe number honestly alongside the default.
#
# Run on a QUIET chip (after the chain's own cutover tests; two tunnel
# clients corrupt timings and contend the 1-core host):
#   nohup setsid bash tools/sweep_hard_r4.sh > logs/sweep_hard_r4.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}

TCFG=config/synth/hr18GNN2_res6_gnn3Skip_mlpQuery_synth.txt
run() {  # run <tag> [extra cli.test args...]
  local tag=$1; shift
  echo "=== hard sweep: $tag" >&2
  timeout 1800 nice -n 19 python -u -m checkerpose_tpu.cli.test --cfg "$TCFG" \
    --obj_name obj01 --use_latest --decode_mode hard \
    --eval_output_path "eval_output_synth_r4/hard_$tag" "$@" \
    || echo "sweep $tag FAILED" >&2
}

run default
run progx --use_progressivex
run reproj4 --reprojErr_thresh 4
run hyp256 --cv_max_iters 256
run progx_reproj4 --use_progressivex --reprojErr_thresh 4
echo "=== sweep DONE" >&2
