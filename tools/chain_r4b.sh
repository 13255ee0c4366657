#!/bin/bash
# Round-4 chain supervisor, revision B — same serialization contract as
# chain_r4.sh (one tunnel client at a time; every stage leaves artifacts if
# the wall runs out mid-stage) with the VERDICT r3 #4 fix: the round-end
# bench sweep runs EARLY, on the first quiet-chip window (right after the
# single-object cutover tests), NOT last — round 3 ended before the bench
# ever ran and that must not repeat.
#
#   1. wait for the single-object proof driver (run_synth_proof_r4.sh,
#      PID in $SO_PID) to exit — OR cut it at the SO deadline and run the
#      official tests (hard + auto-calibrated adaptive) on the latest ckpt.
#   2. round_end_bench.sh on the now-quiet chip (headline number first).
#   3. launch the LM proof (run_synth_proof_lm_r4.sh); at the LM deadline
#      stop it and run test_lm (hard + auto-adaptive) on whatever exists.
#
# Deadlines are epoch seconds read EVERY MINUTE from files (bumpable live):
#   /tmp/r4_so_deadline   — cut the single-object proof
#   /tmp/r4_lm_deadline   — cut the LM proof
# Run with:
#   SO_PID=<pid> nohup setsid bash tools/chain_r4b.sh > logs/chain_r4b.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}

SO_PID=${SO_PID:?pid of tools/run_synth_proof_r4.sh}
TCFG=config/synth/hr18GNN2_res6_gnn3Skip_mlpQuery_synth.txt
LMCFG=config/synth/hr18GNN2_res6_gnn3Skip_mlpQuery_synthlm.txt
SOCKPT=experiments/checkpoints/hr18GNN2_res6_gnn3Skip_mlpQuery_synth/obj01
LMCKPT=experiments/checkpoints/hr18GNN2_res6_gnn3Skip_mlpQuery_synthlm/lm13

now=$(date -u +%s)
[ -f /tmp/r4_so_deadline ] || echo $(( now + 5 * 3600 )) > /tmp/r4_so_deadline
[ -f /tmp/r4_lm_deadline ] || echo $(( now + 8 * 3600 )) > /tmp/r4_lm_deadline

step_of() { ls "$1" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1; }

stop_tree() {  # kill a driver shell and its children by EXACT pid
  local pid=$1
  for c in $(ps -o pid= --ppid "$pid" 2>/dev/null); do kill "$c" 2>/dev/null; done
  kill "$pid" 2>/dev/null
  sleep 8
  for c in $(ps -o pid= --ppid "$pid" 2>/dev/null); do kill -9 "$c" 2>/dev/null; done
  kill -9 "$pid" 2>/dev/null
}

# ---- stage 1: single-object proof ----------------------------------------
so_cut=0
echo "chain-b: waiting for SO driver pid $SO_PID (deadline file /tmp/r4_so_deadline)" >&2
while kill -0 "$SO_PID" 2>/dev/null; do
  if [ "$(date -u +%s)" -ge "$(cat /tmp/r4_so_deadline)" ]; then
    echo "chain-b: SO deadline hit at $(date -u +%H:%M:%S); cutting driver" >&2
    stop_tree "$SO_PID"; so_cut=1; sleep 20; break
  fi
  sleep 60
done
echo "chain-b: SO stage over at $(date -u +%H:%M:%S) (cut=$so_cut, ckpt $(step_of "$SOCKPT"))" >&2

if [ "$so_cut" = 1 ] && [ -n "$(step_of "$SOCKPT")" ]; then
  echo "=== cutover test: LATEST hard decode" >&2
  timeout 1800 nice -n -5 python -u -m checkerpose_tpu.cli.test --cfg "$TCFG" \
    --obj_name obj01 --use_latest --decode_mode hard \
    --eval_output_path eval_output_synth_r4/latest_hard
  echo "=== cutover test: LATEST adaptive (auto-calibrated tau)" >&2
  timeout 1800 nice -n -5 python -u -m checkerpose_tpu.cli.test --cfg "$TCFG" \
    --obj_name obj01 --use_latest --decode_mode adaptive \
    --eval_output_path eval_output_synth_r4/latest_adaptive
fi

# ---- stage 2: bench sweep on the quiet chip (EARLY — VERDICT r3 #4) -------
echo "chain-b: round-end bench (early slot) at $(date -u +%H:%M:%S)" >&2
timeout 4500 bash tools/round_end_bench.sh > logs/round_end_bench_r4.log 2>&1
echo "chain-b: bench done rc=$? at $(date -u +%H:%M:%S)" >&2

# ---- stage 3: LM proof -----------------------------------------------------
echo "chain-b: launching LM proof at $(date -u +%H:%M:%S)" >&2
setsid bash tools/run_synth_proof_lm_r4.sh >> logs/proof_run_lm_r4.log 2>&1 &
LM_PID=$!
lm_cut=0
while kill -0 "$LM_PID" 2>/dev/null; do
  if [ "$(date -u +%s)" -ge "$(cat /tmp/r4_lm_deadline)" ]; then
    echo "chain-b: LM deadline hit at $(date -u +%H:%M:%S); cutting LM driver" >&2
    stop_tree "$LM_PID"; lm_cut=1; sleep 20; break
  fi
  sleep 60
done
echo "chain-b: LM stage over at $(date -u +%H:%M:%S) (cut=$lm_cut, ckpt $(step_of "$LMCKPT"))" >&2

if [ "$lm_cut" = 1 ] && [ -n "$(step_of "$LMCKPT")" ]; then
  echo "=== cutover test_lm: LATEST hard decode" >&2
  timeout 2400 nice -n -5 python -u -m checkerpose_tpu.cli.test_lm --cfg "$LMCFG" \
    --use_latest --decode_mode hard \
    --eval_output_path eval_output_synthlm_r4/latest_hard
  echo "=== cutover test_lm: LATEST adaptive (auto-calibrated tau)" >&2
  timeout 2400 nice -n -5 python -u -m checkerpose_tpu.cli.test_lm --cfg "$LMCFG" \
    --use_latest --decode_mode adaptive \
    --eval_output_path eval_output_synthlm_r4/latest_adaptive
fi

echo "chain-b: DONE at $(date -u +%H:%M:%S)" >&2
