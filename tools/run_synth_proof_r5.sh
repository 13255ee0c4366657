#!/bin/bash
# Round-5 single-object proof: the fine-bit-lever A/B against round 4
# (VERDICT r4 item 2). Chain identical to run_synth_proof_r4.sh through
# the TF anneal (NOCS 2400 -> init pretrain 6000 -> train, anneal
# 2800->5800, coord_reg 0.25, aux+TF as r4); from step 5800 the train cfg
# arms prefix-correct fine-bit masking + 3x fine-bit loss boost where r4
# ran plain BCE. r4's committed trajectory (ACCURACY.md: bit5 flat at
# ~0.485, gate flat 0.766 from 6000) is the control arm at equal steps.
#
#   stage 3  official cli.test on the latest ckpt: hard (3 filter modes +
#            survival instrumentation), hard + --filter_judge_bits 4 (the
#            round-5 filter-collapse mitigation's first real-model check),
#            and auto-calibrated adaptive.
#
# Run with:
#   nohup setsid bash tools/run_synth_proof_r5.sh > logs/proof_run_r5.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}

SEG=${SEG:-1200}
BK_TOTAL=${BK_TOTAL:-2400}
PRETRAIN_TOTAL=${PRETRAIN_TOTAL:-6000}
TRAIN_TOTAL=${TRAIN_TOTAL:-12000}
TEST_FREQ=${TEST_FREQ:-2000}
SAVE_FREQ=${SAVE_FREQ:-600}
BKCFG=config/synth/nocs_backbone_synth.txt
PCFG=config/synth/init_gnn2_hrnetw18_npt512_synth.txt
TCFG=config/synth/hr18GNN2_res6_gnn3Skip_mlpQuery_synth.txt
OUT=${OUT:-eval_output_synth_r5}

# fresh round-5 run: archive any round-4 checkpoints once
if [ ! -f experiments/checkpoints/.r5_so_started ]; then
  mkdir -p experiments/checkpoints/r4_archive
  for d in nocs_backbone_synth init_gnn2_hrnetw18_npt512_synth \
           hr18GNN2_res6_gnn3Skip_mlpQuery_synth; do
    [ -d "experiments/checkpoints/$d" ] && \
      mv "experiments/checkpoints/$d" "experiments/checkpoints/r4_archive/$d"
  done
  touch experiments/checkpoints/.r5_so_started
fi

if [ ! -f /tmp/synth_scale3/synth/camera.json ]; then
  echo "=== dataset missing; regenerating /tmp/synth_scale3" >&2
  CHECKERPOSE_PLATFORM=cpu python -u tools/gen_synth_scale.py /tmp/synth_scale3 \
    >> logs/gen_synth.log 2>&1 || { echo "dataset gen FAILED" >&2; exit 1; }
fi

step_of() { ls "$1" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1; }

run_watchdogged() {  # dead-claim watchdog + post-kill cooldown (see LM r5)
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
    if [ "$stalls" -ge 8 ]; then
      # TERM first (claim-waiters exit cleanly; -9 renews the tunnel wedge)
      echo "WATCHDOG: pid $pid stalled — TERM, grace 20s, then cooling 240s" >&2
      kill "$pid"; sleep 20
      kill -9 "$pid" 2>/dev/null; wait "$pid" 2>/dev/null
      sleep 240
      return 1
    fi
  done
  wait "$pid"
}

bank() {  # commit the SMALL evidence files so a VM restore can only ever
  # cost one segment of results, never the campaign's (round-5 final
  # session lost the whole SO A/B outcome to a restore because nothing
  # after the last manual commit was in git). Checkpoints stay out of
  # git (orbax dirs are ~90 MB); metrics/eval reports are KBs.
  ( cd /root/repo || exit 0
    find experiments/tensorboard_logs -name metrics.jsonl -size -20M \
      2>/dev/null | while read -r f; do git add -f "$f"; done
    find experiments/checkpoints -name best_score.json 2>/dev/null \
      | while read -r f; do git add -f "$f"; done
    [ -d "$OUT" ] && git add -f "$OUT" 2>/dev/null
    git diff --cached --quiet 2>/dev/null \
      || git commit -q -m "bank: SO r5 evidence ($1)" || true
  )
}

seg_loop() {  # seg_loop <ckpt_dir> <total> <module> [extra args...]
  local dir=$1 total=$2 module=$3; shift 3
  while true; do
    local cur tgt
    cur=$(step_of "$dir"); cur=${cur:-0}
    [ "$cur" -ge "$total" ] && break
    tgt=$((cur + SEG)); [ "$tgt" -gt "$total" ] && tgt=$total
    echo "=== $module segment -> $tgt (from $cur) [$(date -u +%H:%M:%S)]" >&2
    if [ "$cur" -eq 0 ]; then
      run_watchdogged nice -n -5 python -u -m "checkerpose_tpu.cli.$module" \
        --total_iteration "$tgt" --save_freq "$SAVE_FREQ" "$@" \
        || { echo "$module segment failed" >&2; sleep 10; }
    else
      run_watchdogged nice -n -5 python -u -m "checkerpose_tpu.cli.$module" \
        --load_checkpoint --total_iteration "$tgt" --save_freq "$SAVE_FREQ" "$@" \
        || { echo "$module segment failed" >&2; sleep 10; }
    fi
    bank "$module@$(step_of "$dir")"
  done
  echo "=== $module complete at $total [$(date -u +%H:%M:%S)]" >&2
}

seg_loop experiments/checkpoints/nocs_backbone_synth/obj01 "$BK_TOTAL" \
  pretrain_backbone --cfg "$BKCFG" --obj_name obj01
seg_loop experiments/checkpoints/init_gnn2_hrnetw18_npt512_synth/obj01 "$PRETRAIN_TOTAL" \
  pretrain --cfg "$PCFG" --obj_name obj01 --test_freq "$TEST_FREQ"
seg_loop experiments/checkpoints/hr18GNN2_res6_gnn3Skip_mlpQuery_synth/obj01 "$TRAIN_TOTAL" \
  train --cfg "$TCFG" --obj_name obj01 --test_freq "$TEST_FREQ"

echo "=== final tests [$(date -u +%H:%M:%S)]" >&2
run_watchdogged nice -n -5 python -u -m checkerpose_tpu.cli.test --cfg "$TCFG" \
  --obj_name obj01 --use_latest --decode_mode hard \
  --eval_output_path "$OUT/latest_hard"
run_watchdogged nice -n -5 python -u -m checkerpose_tpu.cli.test --cfg "$TCFG" \
  --obj_name obj01 --use_latest --decode_mode hard --filter_judge_bits 4 \
  --eval_output_path "$OUT/latest_hard_judge4"
run_watchdogged nice -n -5 python -u -m checkerpose_tpu.cli.test --cfg "$TCFG" \
  --obj_name obj01 --use_latest --decode_mode adaptive \
  --eval_output_path "$OUT/latest_adaptive_auto"
run_watchdogged nice -n -5 python -u -m checkerpose_tpu.cli.test --cfg "$TCFG" \
  --obj_name obj01 --decode_mode hard \
  --eval_output_path "$OUT/best_hard"
bank "final-tests"
echo "=== DONE [$(date -u +%H:%M:%S)]" >&2
