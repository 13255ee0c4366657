#!/bin/bash
# Round-4 single-object proof recipe — the full accuracy push with every
# lever the round-3 diagnosis produced (ACCURACY.md findings 2-5):
#
#   stage 0  NOCS backbone pretraining (cli.pretrain_backbone, 8k steps):
#            dense normalized-object-coordinate regression teaches the
#            backbone per-image scale/offset binding + sub-4px features —
#            the offline substitute for the reference's ImageNet init.
#   stage 1  init-net pretrain (6k) grafting that backbone
#            (backbone_pretrain_checkpoint in the cfg).
#   stage 2  full train with aux refine heatmaps + teacher forcing annealed
#            + coord_reg_loss_weight 0.25 (coordinate-space anti-bias) for
#            as many steps as the round's wall allows (56k target).
#   stage 3  official cli.test: hard + adaptive(tau swept 4/5/6) on latest.
#
# Same segmented-restart discipline as run_synth_proof.sh (tunnel client
# degradation, CLAUDE.md 6b). Run with:
#   nohup setsid bash tools/run_synth_proof_r4.sh > logs/proof_run_r4.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}

SEG=${SEG:-1200}
BK_TOTAL=${BK_TOTAL:-8000}
PRETRAIN_TOTAL=${PRETRAIN_TOTAL:-6000}
TRAIN_TOTAL=${TRAIN_TOTAL:-24000}
TEST_FREQ=${TEST_FREQ:-2000}
SAVE_FREQ=${SAVE_FREQ:-600}
BKCFG=config/synth/nocs_backbone_synth.txt
PCFG=config/synth/init_gnn2_hrnetw18_npt512_synth.txt
TCFG=config/synth/hr18GNN2_res6_gnn3Skip_mlpQuery_synth.txt

# fresh round-4 run: archive round-3 checkpoints once (resumable afterwards)
if [ ! -f experiments/checkpoints/.r4_started ]; then
  mkdir -p experiments/checkpoints/r3_archive
  for d in init_gnn2_hrnetw18_npt512_synth hr18GNN2_res6_gnn3Skip_mlpQuery_synth; do
    [ -d "experiments/checkpoints/$d" ] && \
      mv "experiments/checkpoints/$d" "experiments/checkpoints/r3_archive/$d"
  done
  touch experiments/checkpoints/.r4_started
fi

if [ ! -f /tmp/synth_scale3/synth/camera.json ]; then
  echo "=== dataset missing; regenerating /tmp/synth_scale3" >&2
  CHECKERPOSE_PLATFORM=cpu python -u tools/gen_synth_scale.py /tmp/synth_scale3 \
    >> logs/gen_synth.log 2>&1 || { echo "dataset gen FAILED" >&2; exit 1; }
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

seg_loop() {  # seg_loop <ckpt_dir> <total> <module> [extra args...]
  local dir=$1 total=$2 module=$3; shift 3
  while true; do
    local cur tgt
    cur=$(step_of "$dir"); cur=${cur:-0}
    [ "$cur" -ge "$total" ] && break
    tgt=$((cur + SEG)); [ "$tgt" -gt "$total" ] && tgt=$total
    echo "=== $module segment -> $tgt (from $cur)" >&2
    if [ "$cur" -eq 0 ]; then
      run_watchdogged nice -n -5 python -u -m "checkerpose_tpu.cli.$module" \
        --total_iteration "$tgt" --save_freq "$SAVE_FREQ" "$@" \
        || { echo "$module segment failed" >&2; sleep 10; }
    else
      run_watchdogged nice -n -5 python -u -m "checkerpose_tpu.cli.$module" \
        --load_checkpoint --total_iteration "$tgt" --save_freq "$SAVE_FREQ" "$@" \
        || { echo "$module segment failed" >&2; sleep 10; }
    fi
  done
  echo "=== $module complete at $total" >&2
}

seg_loop experiments/checkpoints/nocs_backbone_synth/obj01 "$BK_TOTAL" \
  pretrain_backbone --cfg "$BKCFG" --obj_name obj01
seg_loop experiments/checkpoints/init_gnn2_hrnetw18_npt512_synth/obj01 "$PRETRAIN_TOTAL" \
  pretrain --cfg "$PCFG" --obj_name obj01 --test_freq "$TEST_FREQ"
seg_loop experiments/checkpoints/hr18GNN2_res6_gnn3Skip_mlpQuery_synth/obj01 "$TRAIN_TOTAL" \
  train --cfg "$TCFG" --obj_name obj01 --test_freq "$TEST_FREQ"

echo "=== final tests (hard + adaptive sweep, latest ckpt)" >&2
run_watchdogged nice -n -5 python -u -m checkerpose_tpu.cli.test --cfg "$TCFG" \
  --obj_name obj01 --use_latest --decode_mode hard \
  --eval_output_path eval_output_synth_r4/latest_hard
for tau in 4 5 6; do
  run_watchdogged nice -n -5 python -u -m checkerpose_tpu.cli.test --cfg "$TCFG" \
    --obj_name obj01 --use_latest --decode_conf_tau "$tau" \
    --eval_output_path "eval_output_synth_r4/latest_tau$tau"
done
echo "=== DONE" >&2
