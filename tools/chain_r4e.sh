#!/bin/bash
# Session-9 revision E — takeover end-game for the LM proof.
#
# Why: the LM pretrain's first TPU step compile ran >25 min (the one-hot
# gather landed this round, so every LM program is cold), which makes the
# scripted pretrain-2400 -> train_lm-8000 pipeline unable to produce ANY
# train_lm checkpoint before the ~12:00 UTC round end. This supervisor:
#   1. waits for the pretrain checkpoint to reach 1200 (the NOCS-grafted
#      init pretrain matches r3's from-scratch 2400 quality at ~1200 —
#      session-1 compression table) OR the drop-dead time;
#   2. takes over in the inter-segment gap (kills chain_r4d + the LM proof
#      driver while no python holds a tunnel claim — a kill mid-claim
#      wedges the tunnel for ~15 min, NOTES session 8);
#   3. runs train_lm in short segments (save_freq 300 so even a ~5-min
#      window leaves a testable checkpoint) until the LM deadline;
#   4. runs test_lm hard (+ adaptive if time allows);
#   5. runs the end-window bench recovery sweep.
# Usage:
#   LMPROOF_PID=<pid> CHAIND_PID=<pid> nohup setsid bash tools/chain_r4e.sh \
#     > logs/chain_r4e.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}

LMPROOF_PID=${LMPROOF_PID:?}
CHAIND_PID=${CHAIND_PID:?}
LM_DEADLINE=${LM_DEADLINE:-1787224800}   # 11:20 UTC — stop train_lm
DROP_DEAD=${DROP_DEAD:-1787223900}       # 11:05 UTC — stop waiting for pretrain
GUARD=${GUARD:-1787226600}               # 11:50 UTC — no new chip work after
PCKPT=experiments/checkpoints/init_gnn2_hrnetw18_npt512_synthlm/lm13
TCKPT=experiments/checkpoints/hr18GNN2_res6_gnn3Skip_mlpQuery_synthlm/lm13
LMCFG=config/synth/hr18GNN2_res6_gnn3Skip_mlpQuery_synthlm.txt

step_of() { ls "$1" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1; }

stop_tree() {
  local pid=$1
  for c in $(ps -o pid= --ppid "$pid" 2>/dev/null); do
    for g in $(ps -o pid= --ppid "$c" 2>/dev/null); do kill "$g" 2>/dev/null; done
    kill "$c" 2>/dev/null
  done
  kill "$pid" 2>/dev/null
  sleep 8
  for c in $(ps -o pid= --ppid "$pid" 2>/dev/null); do kill -9 "$c" 2>/dev/null; done
  kill -9 "$pid" 2>/dev/null
}

# ---- stage 1: wait for pretrain 1200 (or drop-dead) -----------------------
echo "chain-e: waiting for pretrain ckpt >= 1200 (drop-dead $(date -ud @$DROP_DEAD +%H:%M))" >&2
while kill -0 "$LMPROOF_PID" 2>/dev/null; do
  s=$(step_of "$PCKPT"); s=${s:-0}
  [ "$s" -ge 1200 ] && break
  [ "$(date -u +%s)" -ge "$DROP_DEAD" ] && break
  sleep 10
done
echo "chain-e: takeover at $(date -u +%H:%M:%S) (pretrain ckpt: $(step_of "$PCKPT"))" >&2

# ---- stage 2: take over ----------------------------------------------------
stop_tree "$CHAIND_PID"
stop_tree "$LMPROOF_PID"
sleep 12

# ---- stage 3: train_lm short segments -------------------------------------
if [ -n "$(step_of "$PCKPT")" ]; then
  while [ "$(date -u +%s)" -lt "$LM_DEADLINE" ]; do
    cur=$(step_of "$TCKPT"); cur=${cur:-0}
    tgt=$(( cur + 600 ))
    rem=$(( LM_DEADLINE - $(date -u +%s) ))
    [ "$rem" -lt 90 ] && break
    echo "=== train_lm segment -> $tgt (from $cur, ${rem}s left)" >&2
    if [ "$cur" -eq 0 ]; then
      timeout "$rem" nice -n -5 python -u -m checkerpose_tpu.cli.train_lm \
        --cfg "$LMCFG" --total_iteration "$tgt" --test_freq 99999 \
        --save_freq 300 || { echo "segment rc=$?" >&2; sleep 5; }
    else
      timeout "$rem" nice -n -5 python -u -m checkerpose_tpu.cli.train_lm \
        --cfg "$LMCFG" --load_checkpoint --total_iteration "$tgt" \
        --test_freq 99999 --save_freq 300 || { echo "segment rc=$?" >&2; sleep 5; }
    fi
  done
else
  echo "chain-e: NO pretrain checkpoint — skipping train_lm" >&2
fi
echo "chain-e: train_lm stage over at $(date -u +%H:%M:%S) (ckpt $(step_of "$TCKPT"))" >&2

# ---- stage 4: test_lm ------------------------------------------------------
if [ -n "$(step_of "$TCKPT")" ]; then
  echo "=== test_lm: LATEST hard decode" >&2
  timeout 1500 nice -n -5 python -u -m checkerpose_tpu.cli.test_lm --cfg "$LMCFG" \
    --use_latest --decode_mode hard \
    --eval_output_path eval_output_synthlm_r4/latest_hard
  if [ "$(date -u +%s)" -lt "$(( GUARD - 600 ))" ]; then
    echo "=== test_lm: LATEST adaptive (auto-calibrated tau)" >&2
    timeout 900 nice -n -5 python -u -m checkerpose_tpu.cli.test_lm --cfg "$LMCFG" \
      --use_latest --decode_mode adaptive \
      --eval_output_path eval_output_synthlm_r4/latest_adaptive
  fi
fi

# ---- stage 5: bench recovery ----------------------------------------------
GUARD=$GUARD bash tools/end_window_bench_r4.sh >> logs/round_end_bench_r4.log 2>&1
echo "chain-e: DONE at $(date -u +%H:%M:%S)" >&2
