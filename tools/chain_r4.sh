#!/bin/bash
# Round-4 chain supervisor: serializes the whole TPU schedule so the chip
# never has two tunnel clients (NOTES_ROUND2.md env lessons) and every
# stage still produces its artifacts if the wall runs out mid-stage.
#
#   1. wait for the single-object proof driver (run_synth_proof_r4.sh,
#      PID in $SO_PID) to exit — OR cut it at the SO deadline and run the
#      official tests (hard + tau5) on the latest checkpoint ourselves.
#   2. launch the LM proof (run_synth_proof_lm_r4.sh); at the LM deadline
#      stop it and run test_lm (hard + tau5) on whatever checkpoint exists.
#   3. run tools/round_end_bench.sh on the quiet chip.
#
# Deadlines are epoch seconds read EVERY MINUTE from files, so they can be
# bumped live without restarting the supervisor:
#   /tmp/r4_so_deadline   — cut the single-object proof (default: init+6h)
#   /tmp/r4_lm_deadline   — cut the LM proof           (default: init+8h)
# Run with:
#   SO_PID=<pid> nohup setsid bash tools/chain_r4.sh > logs/chain_r4.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}

SO_PID=${SO_PID:?pid of tools/run_synth_proof_r4.sh}
TCFG=config/synth/hr18GNN2_res6_gnn3Skip_mlpQuery_synth.txt
LMCFG=config/synth/hr18GNN2_res6_gnn3Skip_mlpQuery_synthlm.txt
SOCKPT=experiments/checkpoints/hr18GNN2_res6_gnn3Skip_mlpQuery_synth/obj01
LMCKPT=experiments/checkpoints/hr18GNN2_res6_gnn3Skip_mlpQuery_synthlm/lm13

now=$(date -u +%s)
[ -f /tmp/r4_so_deadline ] || echo $(( now + 6 * 3600 )) > /tmp/r4_so_deadline
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
echo "chain: waiting for SO driver pid $SO_PID (deadline file /tmp/r4_so_deadline)" >&2
while kill -0 "$SO_PID" 2>/dev/null; do
  if [ "$(date -u +%s)" -ge "$(cat /tmp/r4_so_deadline)" ]; then
    echo "chain: SO deadline hit at $(date -u +%H:%M:%S); cutting driver" >&2
    stop_tree "$SO_PID"; so_cut=1; sleep 20; break
  fi
  sleep 60
done
echo "chain: SO stage over at $(date -u +%H:%M:%S) (cut=$so_cut, ckpt $(step_of "$SOCKPT"))" >&2

if [ "$so_cut" = 1 ] && [ -n "$(step_of "$SOCKPT")" ]; then
  echo "=== cutover test: LATEST hard decode" >&2
  timeout 1800 nice -n -5 python -u -m checkerpose_tpu.cli.test --cfg "$TCFG" \
    --obj_name obj01 --use_latest --decode_mode hard \
    --eval_output_path eval_output_synth_r4/latest_hard
  echo "=== cutover test: LATEST adaptive tau=5" >&2
  timeout 1800 nice -n -5 python -u -m checkerpose_tpu.cli.test --cfg "$TCFG" \
    --obj_name obj01 --use_latest --decode_conf_tau 5 \
    --eval_output_path eval_output_synth_r4/latest_tau5
fi

# ---- stage 2: LM proof -----------------------------------------------------
echo "chain: launching LM proof at $(date -u +%H:%M:%S)" >&2
setsid bash tools/run_synth_proof_lm_r4.sh >> logs/proof_run_lm_r4.log 2>&1 &
LM_PID=$!
lm_cut=0
while kill -0 "$LM_PID" 2>/dev/null; do
  if [ "$(date -u +%s)" -ge "$(cat /tmp/r4_lm_deadline)" ]; then
    echo "chain: LM deadline hit at $(date -u +%H:%M:%S); cutting LM driver" >&2
    stop_tree "$LM_PID"; lm_cut=1; sleep 20; break
  fi
  sleep 60
done
echo "chain: LM stage over at $(date -u +%H:%M:%S) (cut=$lm_cut, ckpt $(step_of "$LMCKPT"))" >&2

if [ "$lm_cut" = 1 ] && [ -n "$(step_of "$LMCKPT")" ]; then
  echo "=== cutover test_lm: LATEST hard decode" >&2
  timeout 2400 nice -n -5 python -u -m checkerpose_tpu.cli.test_lm --cfg "$LMCFG" \
    --use_latest --decode_mode hard \
    --eval_output_path eval_output_synthlm_r4/latest_hard
  echo "=== cutover test_lm: LATEST adaptive tau=5" >&2
  timeout 2400 nice -n -5 python -u -m checkerpose_tpu.cli.test_lm --cfg "$LMCFG" \
    --use_latest --decode_mode adaptive --decode_conf_tau 5 \
    --eval_output_path eval_output_synthlm_r4/latest_tau5
fi

# ---- stage 3: round-end bench on the quiet chip ----------------------------
echo "chain: round-end bench at $(date -u +%H:%M:%S)" >&2
bash tools/round_end_bench.sh > logs/round_end_bench_r4.log 2>&1
echo "chain: DONE at $(date -u +%H:%M:%S)" >&2
