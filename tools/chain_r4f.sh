#!/bin/bash
# Session-9 revision F — final end-game driver (supersedes chain_r4d/e).
#
# Trigger discipline: the ONLY wedge-free moment to take the chip from the
# LM proof is the inter-segment gap — after the pretrain segment-1 python
# (target 1200) has fully exited and while the freshly-launched segment-2
# python is still in imports (~40 s before it touches the tunnel). The
# proof driver prints "=== pretrain_lm segment -> 2400" exactly in that
# gap, so we poll the LOG for that marker (5 s period), not the checkpoint
# dir (which appears while segment-1 still holds the claim; killing then
# wedges the tunnel ~15 min — NOTES_ROUND4 session 8).
#
# Fallback: if the marker never appears by DROP_DEAD (pretrain compile ran
# even longer, or the segment died), cut anyway and eat the possible wedge
# — at that point there is no schedule left to protect.
#
# Usage:
#   LMPROOF_PID=<pid> CHAIND_PID=<pid> nohup setsid bash tools/chain_r4f.sh \
#     > logs/chain_r4f.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}

LMPROOF_PID=${LMPROOF_PID:?}
CHAIND_PID=${CHAIND_PID:?}
LMLOG=${LMLOG:-logs/proof_run_lm_r4.log}
MARKER="pretrain_lm segment -> 2400"
LM_DEADLINE=${LM_DEADLINE:-1787224980}   # 11:23 UTC — stop train_lm
DROP_DEAD=${DROP_DEAD:-1787224500}       # 11:15 UTC — cut even without the marker
GUARD=${GUARD:-1787226600}               # 11:50 UTC — no new chip work after
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
  sleep 6
  for c in $(ps -o pid= --ppid "$pid" 2>/dev/null); do kill -9 "$c" 2>/dev/null; done
  kill -9 "$pid" 2>/dev/null
}

echo "chain-f: waiting for gap marker or DROP_DEAD $(date -ud @$DROP_DEAD +%H:%M)" >&2
while kill -0 "$LMPROOF_PID" 2>/dev/null; do
  grep -q "$MARKER" "$LMLOG" 2>/dev/null && { echo "chain-f: gap marker seen" >&2; break; }
  [ "$(date -u +%s)" -ge "$DROP_DEAD" ] && { echo "chain-f: drop-dead cut" >&2; break; }
  sleep 5
done

echo "chain-f: takeover at $(date -u +%H:%M:%S)" >&2
stop_tree "$CHAIND_PID"
stop_tree "$LMPROOF_PID"
sleep 8

# ---- train_lm short segments ----------------------------------------------
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
echo "chain-f: train_lm stage over at $(date -u +%H:%M:%S) (ckpt $(step_of "$TCKPT"))" >&2

# ---- test_lm ----------------------------------------------------------------
if [ -n "$(step_of "$TCKPT")" ]; then
  echo "=== test_lm: LATEST hard decode" >&2
  timeout 1500 nice -n -5 python -u -m checkerpose_tpu.cli.test_lm --cfg "$LMCFG" \
    --use_latest --decode_mode hard \
    --eval_output_path eval_output_synthlm_r4/latest_hard
  if [ "$(date -u +%s)" -lt "$(( GUARD - 540 ))" ]; then
    echo "=== test_lm: LATEST adaptive (auto-calibrated tau)" >&2
    timeout 900 nice -n -5 python -u -m checkerpose_tpu.cli.test_lm --cfg "$LMCFG" \
      --use_latest --decode_mode adaptive \
      --eval_output_path eval_output_synthlm_r4/latest_adaptive
  fi
fi

# ---- bench recovery ---------------------------------------------------------
GUARD=$GUARD bash tools/end_window_bench_r4.sh >> logs/round_end_bench_r4.log 2>&1
echo "chain-f: DONE at $(date -u +%H:%M:%S)" >&2
