#!/bin/bash
# Round-3 TPU cutover: stop the single-object proof at >=STOP_AT steps,
# run the official tests (hard + adaptive, latest + best), then hand the
# chip to the shortened multi-object LM proof with a hard wall-clock
# deadline — at DEADLINE_UTC the LM driver is stopped and test_lm runs on
# whatever checkpoint exists, so bench.py has a quiet chip at round end.
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}

DRIVER_PID=${DRIVER_PID:?pid of tools/run_synth_proof.sh}
STOP_AT=${STOP_AT:-20400}
DEADLINE_UTC=${DEADLINE_UTC:-15:20}
TCFG=config/synth/hr18GNN2_res6_gnn3Skip_mlpQuery_synth.txt
LMCFG=config/synth/hr18GNN2_res6_gnn3Skip_mlpQuery_synthlm.txt
CKPT=experiments/checkpoints/hr18GNN2_res6_gnn3Skip_mlpQuery_synth/obj01
LMCKPT=experiments/checkpoints/hr18GNN2_res6_gnn3Skip_mlpQuery_synthlm/lm13

step_of() { ls "$1" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1; }

stop_tree() {  # kill a driver shell and its children by EXACT pid
  local pid=$1
  for c in $(ps -o pid= --ppid "$pid" 2>/dev/null); do kill "$c" 2>/dev/null; done
  kill "$pid" 2>/dev/null
  sleep 8
  for c in $(ps -o pid= --ppid "$pid" 2>/dev/null); do kill -9 "$c" 2>/dev/null; done
  kill -9 "$pid" 2>/dev/null
}

echo "cutover: waiting for checkpoint >= $STOP_AT in $CKPT" >&2
while true; do
  cur=$(step_of "$CKPT"); cur=${cur:-0}
  [ "$cur" -ge "$STOP_AT" ] && break
  kill -0 "$DRIVER_PID" 2>/dev/null || { echo "driver died early at $cur" >&2; break; }
  sleep 60
done
echo "cutover: reached ${cur} at $(date -u +%H:%M:%S); stopping driver $DRIVER_PID" >&2
stop_tree "$DRIVER_PID"
sleep 20

echo "=== official test: LATEST ckpt, hard decode (reference parity)" >&2
timeout 1500 nice -n -5 python -u -m checkerpose_tpu.cli.test --cfg "$TCFG" \
  --obj_name obj01 --use_latest --decode_mode hard \
  --eval_output_path eval_output_synth_r3/latest_hard
echo "=== official test: LATEST ckpt, adaptive tau=5" >&2
timeout 1500 nice -n -5 python -u -m checkerpose_tpu.cli.test --cfg "$TCFG" \
  --obj_name obj01 --use_latest \
  --eval_output_path eval_output_synth_r3/latest_tau5
echo "=== official test: BEST ckpt, adaptive tau=5" >&2
timeout 1500 nice -n -5 python -u -m checkerpose_tpu.cli.test --cfg "$TCFG" \
  --obj_name obj01 \
  --eval_output_path eval_output_synth_r3/best_tau5

echo "=== launching LM proof driver at $(date -u +%H:%M:%S)" >&2
PRETRAIN_TOTAL=${LM_PRETRAIN_TOTAL:-2400} TRAIN_TOTAL=${LM_TRAIN_TOTAL:-6000} \
  setsid bash tools/run_synth_proof_lm.sh >> logs/proof_run_lm_r3.log 2>&1 &
LM_PID=$!

# deadline watch: past DEADLINE_UTC, stop the LM driver and test whatever
# checkpoint exists (the driver's own final test only runs if train completed)
dl_s=$(date -u -d "today $DEADLINE_UTC" +%s)
while kill -0 "$LM_PID" 2>/dev/null; do
  [ "$(date -u +%s)" -ge "$dl_s" ] && break
  sleep 60
done
if kill -0 "$LM_PID" 2>/dev/null; then
  echo "=== deadline $DEADLINE_UTC hit; stopping LM driver" >&2
  stop_tree "$LM_PID"
  sleep 20
  if [ -n "$(step_of "$LMCKPT")" ]; then
    echo "=== deadline test_lm on latest LM checkpoint" >&2
    timeout 1500 nice -n -5 python -u -m checkerpose_tpu.cli.test_lm \
      --cfg "$LMCFG" --eval_output_path eval_output_synthlm
  fi
fi
echo "=== cutover DONE at $(date -u +%H:%M:%S)" >&2
