#!/bin/bash
# Round-4 multi-object (LM-path) proof: rerun the 4-object synthetic proof
# at a REAL schedule, unlocked by the one-hot-matmul EdgeConv gather
# (models/graph.py) that removes the ~6x stacked-KNN train-step penalty
# round 3 measured (~2 s vs ~0.3 s single-object).
#
#   stage 1  pretrain_lm: REUSED from round 3 at 2400 steps by default
#            (the gather rewrite is value-exact, checkpoints carry over);
#            set FRESH_PRETRAIN=1 to retrain (e.g. with a NOCS backbone
#            graft wired into the pretrain cfg).
#   stage 2  train_lm to TRAIN_TOTAL (default 8000; cfg anneal/lr2 must be
#            rescaled to match — see config/synth/..._synthlm.txt).
#   stage 3  test_lm: hard decode (reference parity) + adaptive tau sweep,
#            side by side, per-object + average (VERDICT r2 item 2).
#
# Same segmented-restart + dead-claim-watchdog discipline as
# run_synth_proof.sh (tunnel degradation, CLAUDE.md 6b). Run with:
#   nohup setsid bash tools/run_synth_proof_lm_r4.sh > logs/proof_run_lm_r4.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}

SEG=${SEG:-1200}
PRETRAIN_TOTAL=${PRETRAIN_TOTAL:-2400}
TRAIN_TOTAL=${TRAIN_TOTAL:-8000}
TEST_FREQ=${TEST_FREQ:-2000}
SAVE_FREQ=${SAVE_FREQ:-600}
PCFG=config/synth/init_gnn2_hrnetw18_npt512_synthlm.txt
TCFG=config/synth/hr18GNN2_res6_gnn3Skip_mlpQuery_synthlm.txt
PCKPT=experiments/checkpoints/init_gnn2_hrnetw18_npt512_synthlm/lm13
TCKPT=experiments/checkpoints/hr18GNN2_res6_gnn3Skip_mlpQuery_synthlm/lm13

if [ ! -f /tmp/synth_lm/synth/camera.json ]; then
  echo "=== dataset missing; regenerating /tmp/synth_lm" >&2
  CHECKERPOSE_PLATFORM=cpu python -u tools/gen_synth_lm.py /tmp/synth_lm \
    >> logs/gen_synth_lm.log 2>&1 || { echo "dataset gen FAILED" >&2; exit 1; }
fi

# fresh round-4 train run: archive the round-3 short-schedule checkpoints
if [ ! -f experiments/checkpoints/.r4_lm_started ]; then
  mkdir -p experiments/checkpoints/r3_archive
  [ -d "$TCKPT" ] && mv "$TCKPT" experiments/checkpoints/r3_archive/train_lm13
  if [ "${FRESH_PRETRAIN:-0}" = "1" ] && [ -d "$PCKPT" ]; then
    mv "$PCKPT" experiments/checkpoints/r3_archive/pretrain_lm13
  fi
  touch experiments/checkpoints/.r4_lm_started
fi

step_of() { ls "$1" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1; }

run_watchdogged() {  # dead-claim watchdog, see run_synth_proof.sh
  "$@" &
  local pid=$! stalls=0 prev=0
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    local stat cpu
    stat=$(cat /proc/$pid/stat 2>/dev/null) || break
    set -- $stat
    cpu=$(( ${14} + ${15} ))
    if [ $(( cpu - prev )) -lt 200 ]; then stalls=$(( stalls + 1 )); else stalls=0; fi
    prev=$cpu
    if [ "$stalls" -ge 5 ]; then
      echo "WATCHDOG: pid $pid stalled — killing" >&2
      kill -9 "$pid"; wait "$pid" 2>/dev/null; return 1
    fi
  done
  wait "$pid"
}

seg_loop() {  # seg_loop <ckpt_dir> <total> <module>
  local dir=$1 total=$2 module=$3
  while true; do
    local cur tgt
    cur=$(step_of "$dir"); cur=${cur:-0}
    [ "$cur" -ge "$total" ] && break
    tgt=$((cur + SEG)); [ "$tgt" -gt "$total" ] && tgt=$total
    echo "=== $module segment -> $tgt (from $cur)" >&2
    if [ "$cur" -eq 0 ]; then
      run_watchdogged nice -n -5 python -u -m "checkerpose_tpu.cli.$module" \
        --cfg "$([ "$module" = pretrain_lm ] && echo "$PCFG" || echo "$TCFG")" \
        --total_iteration "$tgt" --test_freq "$TEST_FREQ" --save_freq "$SAVE_FREQ" \
        || { echo "$module segment failed" >&2; sleep 10; }
    else
      run_watchdogged nice -n -5 python -u -m "checkerpose_tpu.cli.$module" \
        --cfg "$([ "$module" = pretrain_lm ] && echo "$PCFG" || echo "$TCFG")" \
        --load_checkpoint --total_iteration "$tgt" --test_freq "$TEST_FREQ" \
        --save_freq "$SAVE_FREQ" \
        || { echo "$module segment failed" >&2; sleep 10; }
    fi
  done
  echo "=== $module complete at $total" >&2
}

seg_loop "$PCKPT" "$PRETRAIN_TOTAL" pretrain_lm
seg_loop "$TCKPT" "$TRAIN_TOTAL" train_lm

echo "=== final test_lm sweep (latest ckpt: hard + adaptive taus)" >&2
run_watchdogged nice -n -5 python -u -m checkerpose_tpu.cli.test_lm --cfg "$TCFG" \
  --use_latest --decode_mode hard \
  --eval_output_path eval_output_synthlm_r4/latest_hard
for tau in 4 5 6; do
  run_watchdogged nice -n -5 python -u -m checkerpose_tpu.cli.test_lm --cfg "$TCFG" \
    --use_latest --decode_mode adaptive --decode_conf_tau "$tau" \
    --eval_output_path "eval_output_synthlm_r4/latest_tau$tau"
done
echo "=== DONE" >&2
