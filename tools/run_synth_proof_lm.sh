#!/bin/bash
# Round-3 multi-object proof driver: segmented pretrain_lm -> train_lm ->
# test_lm on the 4-object synthetic BOP dataset (tools/gen_synth_lm.py).
# Same segmentation + dead-claim watchdog rationale as run_synth_proof.sh
# (the tunneled-TPU client degrades per process; orbax resume is cheap).
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
# /tmp is wiped by VM restarts (3 observed during round 2): regenerate the
# dataset if missing so an unattended relaunch can always proceed (~7 min).
if [ ! -f /tmp/synth_lm/synth/camera.json ]; then
  echo "=== dataset missing; regenerating /tmp/synth_lm" >&2
  CHECKERPOSE_PLATFORM=cpu python -u tools/gen_synth_lm.py /tmp/synth_lm \
    >> logs/gen_synth_lm.log 2>&1 || { echo "dataset gen FAILED" >&2; exit 1; }
fi
SEG=${SEG:-1200}
PRETRAIN_TOTAL=${PRETRAIN_TOTAL:-5000}
TRAIN_TOTAL=${TRAIN_TOTAL:-20000}
TEST_FREQ=${TEST_FREQ:-2000}
# rolling-save cadence decoupled from eval (wedge-proofing, see
# tools/run_synth_proof.sh): a tunnel stall inside an eval sweep costs
# <=SAVE_FREQ steps instead of a whole segment
SAVE_FREQ=${SAVE_FREQ:-600}
PCFG=config/synth/init_gnn2_hrnetw18_npt512_synthlm.txt
TCFG=config/synth/hr18GNN2_res6_gnn3Skip_mlpQuery_synthlm.txt

step_of() {
  ls "$1" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1
}

run_watchdogged() {
  "$@" &
  local pid=$! stalls=0 prev=0
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    local stat cpu
    stat=$(cat /proc/$pid/stat 2>/dev/null) || break
    set -- $stat
    cpu=$(( ${14} + ${15} ))
    if [ $(( cpu - prev )) -lt 200 ]; then
      stalls=$(( stalls + 1 ))
    else
      stalls=0
    fi
    prev=$cpu
    if [ "$stalls" -ge 5 ]; then
      echo "WATCHDOG: pid $pid CPU stalled ${stalls} min — dead TPU claim, killing" >&2
      kill -9 "$pid"
      wait "$pid" 2>/dev/null
      return 1
    fi
  done
  wait "$pid"
}

while true; do
  cur=$(step_of experiments/checkpoints/init_gnn2_hrnetw18_npt512_synthlm/lm13)
  cur=${cur:-0}
  [ "$cur" -ge "$PRETRAIN_TOTAL" ] && break
  tgt=$((cur + SEG)); [ "$tgt" -gt "$PRETRAIN_TOTAL" ] && tgt=$PRETRAIN_TOTAL
  echo "=== pretrain_lm segment -> $tgt (from $cur)" >&2
  run_watchdogged nice -n -5 python -u -m checkerpose_tpu.cli.pretrain_lm --cfg "$PCFG" \
    --load_checkpoint --total_iteration "$tgt" --test_freq "$TEST_FREQ" \
    --save_freq "$SAVE_FREQ" \
    || { echo "pretrain_lm segment failed" >&2; sleep 10; }
done
echo "=== pretrain_lm complete at $PRETRAIN_TOTAL" >&2

while true; do
  cur=$(step_of experiments/checkpoints/hr18GNN2_res6_gnn3Skip_mlpQuery_synthlm/lm13)
  cur=${cur:-0}
  [ "$cur" -ge "$TRAIN_TOTAL" ] && break
  tgt=$((cur + SEG)); [ "$tgt" -gt "$TRAIN_TOTAL" ] && tgt=$TRAIN_TOTAL
  echo "=== train_lm segment -> $tgt (from $cur)" >&2
  if [ "$cur" -eq 0 ]; then
    run_watchdogged nice -n -5 python -u -m checkerpose_tpu.cli.train_lm --cfg "$TCFG" \
      --total_iteration "$tgt" --test_freq "$TEST_FREQ" --save_freq "$SAVE_FREQ" \
      || { echo "train_lm segment failed" >&2; sleep 10; }
  else
    run_watchdogged nice -n -5 python -u -m checkerpose_tpu.cli.train_lm --cfg "$TCFG" \
      --load_checkpoint --total_iteration "$tgt" --test_freq "$TEST_FREQ" \
      --save_freq "$SAVE_FREQ" \
      || { echo "train_lm segment failed" >&2; sleep 10; }
  fi
done
echo "=== train_lm complete at $TRAIN_TOTAL" >&2

echo "=== final test_lm" >&2
run_watchdogged nice -n -5 python -u -m checkerpose_tpu.cli.test_lm --cfg "$TCFG" \
  --eval_output_path eval_output_synthlm
echo "=== DONE" >&2
