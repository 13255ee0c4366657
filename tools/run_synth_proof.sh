#!/bin/bash
# Round-2 accuracy-proof driver: segmented pretrain -> train -> test on the
# synthetic BOP dataset. Segments restart the process every SEG steps because
# the tunneled-TPU client degrades ~linearly with executions per process
# (measured: 0.18 s/step fresh -> 0.9+ s/step after ~6k steps, plus ~10 MB/step
# RSS growth); orbax resume makes restarts cheap (~90 s, cached compiles).
set -u
cd /root/repo
# keep /root/.axon_site on the path: its sitecustomize registers the axon
# TPU backend (JAX_PLATFORMS=axon fails hard without it)
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
# /tmp is wiped by VM restarts: regenerate the dataset if missing (~20 min)
# so an unattended relaunch can always proceed.
if [ ! -f /tmp/synth_scale3/synth/camera.json ]; then
  echo "=== dataset missing; regenerating /tmp/synth_scale3" >&2
  CHECKERPOSE_PLATFORM=cpu python -u tools/gen_synth_scale.py /tmp/synth_scale3 \
    >> logs/gen_synth.log 2>&1 || { echo "dataset gen FAILED" >&2; exit 1; }
fi
# SEG ~ sqrt(2*restart_cost/degradation_rate): 0.18 s/step fresh, +1.8e-4
# s/step^2 measured -> optimum near 1000-1500 steps/segment.
SEG=${SEG:-1200}
PRETRAIN_TOTAL=${PRETRAIN_TOTAL:-14000}
TRAIN_TOTAL=${TRAIN_TOTAL:-80000}
TEST_FREQ=${TEST_FREQ:-2000}
# rolling-save cadence, decoupled from eval: the tunnel wedges with zero CPU
# inside eval sweeps (2026-08-19 lost a full 1200-step segment that way);
# with saves every 600 steps a wedge costs <=600 steps instead of a segment
SAVE_FREQ=${SAVE_FREQ:-600}
PCFG=config/synth/init_gnn2_hrnetw18_npt512_synth.txt
TCFG=config/synth/hr18GNN2_res6_gnn3Skip_mlpQuery_synth.txt

step_of() {  # latest checkpoint step in dir $1
  ls "$1" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1
}

# Run "$@" under a dead-claim watchdog. The axon tunnel occasionally loses
# the chip grant (observed twice on 2026-08-17): the client blocks forever in
# a futex with ZERO further CPU-time growth while holding the claim, which
# also wedges every later client. Symptom-targeted cure: poll the child's
# cumulative CPU jiffies; if they advance < ~2s across 5 consecutive 60s
# polls, kill -9 the child (the caller's retry loop relaunches and resumes
# from the orbax checkpoint). Normal training burns far more CPU than that
# even while waiting on the TPU; compiles burn a full core.
run_watchdogged() {
  "$@" &
  local pid=$! stalls=0 prev=0
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    local stat cpu
    stat=$(cat /proc/$pid/stat 2>/dev/null) || break
    set -- $stat
    cpu=$(( ${14} + ${15} ))   # utime + stime, jiffies
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
  cur=$(step_of experiments/checkpoints/init_gnn2_hrnetw18_npt512_synth/obj01)
  cur=${cur:-0}
  [ "$cur" -ge "$PRETRAIN_TOTAL" ] && break
  tgt=$((cur + SEG)); [ "$tgt" -gt "$PRETRAIN_TOTAL" ] && tgt=$PRETRAIN_TOTAL
  echo "=== pretrain segment -> $tgt (from $cur)" >&2
  run_watchdogged nice -n -5 python -u -m checkerpose_tpu.cli.pretrain --cfg "$PCFG" \
    --obj_name obj01 --load_checkpoint --total_iteration "$tgt" \
    --test_freq "$TEST_FREQ" --save_freq "$SAVE_FREQ" \
    || { echo "pretrain segment failed" >&2; sleep 10; }
done
echo "=== pretrain complete at $PRETRAIN_TOTAL" >&2

while true; do
  cur=$(step_of experiments/checkpoints/hr18GNN2_res6_gnn3Skip_mlpQuery_synth/obj01)
  cur=${cur:-0}
  [ "$cur" -ge "$TRAIN_TOTAL" ] && break
  tgt=$((cur + SEG)); [ "$tgt" -gt "$TRAIN_TOTAL" ] && tgt=$TRAIN_TOTAL
  echo "=== train segment -> $tgt (from $cur)" >&2
  if [ "$cur" -eq 0 ]; then
    run_watchdogged nice -n -5 python -u -m checkerpose_tpu.cli.train --cfg "$TCFG" \
      --obj_name obj01 --total_iteration "$tgt" --test_freq "$TEST_FREQ" --save_freq "$SAVE_FREQ" \
      || { echo "train segment failed" >&2; sleep 10; }
  else
    run_watchdogged nice -n -5 python -u -m checkerpose_tpu.cli.train --cfg "$TCFG" \
      --obj_name obj01 --load_checkpoint --total_iteration "$tgt" \
      --test_freq "$TEST_FREQ" --save_freq "$SAVE_FREQ" \
      || { echo "train segment failed" >&2; sleep 10; }
  fi
done
echo "=== train complete at $TRAIN_TOTAL" >&2

echo "=== final test" >&2
run_watchdogged nice -n -5 python -u -m checkerpose_tpu.cli.test --cfg "$TCFG" \
  --obj_name obj01 --eval_output_path eval_output_synth
echo "=== DONE" >&2
