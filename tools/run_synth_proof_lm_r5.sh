#!/bin/bash
# Round-5 multi-object (LM-path) proof — the round's first chip job
# (VERDICT r4 item 1: deliver the LM at-scale proof FIRST).
#
#   stage 1  pretrain_lm 2400 from zero (r4's VM restore wiped all
#            checkpoints; NOCS backbone graft falls back from-scratch
#            with a warning — the graft source is gone too).
#   stage 2  train_lm to TRAIN_TOTAL (default 12000; cfg carries the
#            decompressed round-5 schedule: TF anneal 2000->4500,
#            lr2 @8000).
#   stage 3  test_lm on the LATEST and BEST checkpoints: hard decode
#            (reference parity) + auto-calibrated adaptive decode
#            (harness.calibrate_decode_tau on a train-split slice).
#
# Segmented-restart + dead-claim-watchdog discipline per CLAUDE.md 6b.
# Run with:
#   nohup setsid bash tools/run_synth_proof_lm_r5.sh > logs/proof_run_lm_r5.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}

SEG=${SEG:-1200}
PRETRAIN_TOTAL=${PRETRAIN_TOTAL:-2400}
TRAIN_TOTAL=${TRAIN_TOTAL:-12000}
TEST_FREQ=${TEST_FREQ:-2000}
SAVE_FREQ=${SAVE_FREQ:-600}
PCFG=config/synth/init_gnn2_hrnetw18_npt512_synthlm.txt
TCFG=config/synth/hr18GNN2_res6_gnn3Skip_mlpQuery_synthlm.txt
PCKPT=experiments/checkpoints/init_gnn2_hrnetw18_npt512_synthlm/lm13
TCKPT=experiments/checkpoints/hr18GNN2_res6_gnn3Skip_mlpQuery_synthlm/lm13
OUT=${OUT:-eval_output_synthlm_r5}

if [ ! -f /tmp/synth_lm/synth/camera.json ]; then
  echo "=== dataset missing; regenerating /tmp/synth_lm" >&2
  CHECKERPOSE_PLATFORM=cpu python -u tools/gen_synth_lm.py /tmp/synth_lm \
    >> logs/gen_synth_lm.log 2>&1 || { echo "dataset gen FAILED" >&2; exit 1; }
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
    # 8-min tolerance: a tunnel-claim wait after a wedge can exceed 5 min
    # (round-4 session-8 cascade); killing a claim-WAITER renews the wedge
    if [ "$stalls" -ge 8 ]; then
      # TERM first: a claim-WAITER exits cleanly and does not renew the
      # tunnel wedge; kill -9 does (the round-4 4-kill cascade: every -9 of
      # a waiter extended the wedge and the retry loop never recovered).
      echo "WATCHDOG: pid $pid stalled — TERM, grace 20s, then cooling 240s" >&2
      kill "$pid"; sleep 20
      kill -9 "$pid" 2>/dev/null; wait "$pid" 2>/dev/null
      sleep 240
      return 1
    fi
  done
  wait "$pid"
}

bank() {  # commit small evidence after every segment — a VM restore keeps
  # only git state (CLAUDE.md rule 12); without this, a restore erases a
  # whole campaign's results (round-5 final session, SO A/B).
  ( cd /root/repo || exit 0
    find experiments/tensorboard_logs -name metrics.jsonl -size -20M \
      2>/dev/null | while read -r f; do git add -f "$f"; done
    find experiments/checkpoints -name best_score.json 2>/dev/null \
      | while read -r f; do git add -f "$f"; done
    [ -d "$OUT" ] && git add -f "$OUT" 2>/dev/null
    git diff --cached --quiet 2>/dev/null \
      || git commit -q -m "bank: LM r5 evidence ($1)" || true
  )
}

seg_loop() {  # seg_loop <ckpt_dir> <total> <module>
  local dir=$1 total=$2 module=$3
  while true; do
    local cur tgt
    cur=$(step_of "$dir"); cur=${cur:-0}
    [ "$cur" -ge "$total" ] && break
    tgt=$((cur + SEG)); [ "$tgt" -gt "$total" ] && tgt=$total
    echo "=== $module segment -> $tgt (from $cur) [$(date -u +%H:%M:%S)]" >&2
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
    bank "$module@$(step_of "$dir")"
  done
  echo "=== $module complete at $total [$(date -u +%H:%M:%S)]" >&2
}

seg_loop "$PCKPT" "$PRETRAIN_TOTAL" pretrain_lm
seg_loop "$TCKPT" "$TRAIN_TOTAL" train_lm

echo "=== final test_lm sweep: latest+best x hard+auto-adaptive [$(date -u +%H:%M:%S)]" >&2
run_watchdogged nice -n -5 python -u -m checkerpose_tpu.cli.test_lm --cfg "$TCFG" \
  --use_latest --decode_mode hard \
  --eval_output_path "$OUT/latest_hard"
run_watchdogged nice -n -5 python -u -m checkerpose_tpu.cli.test_lm --cfg "$TCFG" \
  --use_latest --decode_mode adaptive \
  --eval_output_path "$OUT/latest_adaptive_auto"
run_watchdogged nice -n -5 python -u -m checkerpose_tpu.cli.test_lm --cfg "$TCFG" \
  --decode_mode hard \
  --eval_output_path "$OUT/best_hard"
run_watchdogged nice -n -5 python -u -m checkerpose_tpu.cli.test_lm --cfg "$TCFG" \
  --decode_mode adaptive \
  --eval_output_path "$OUT/best_adaptive_auto"
echo "=== DONE [$(date -u +%H:%M:%S)]" >&2
