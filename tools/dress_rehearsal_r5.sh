#!/bin/bash
# Round-5 dress rehearsal of the real-data-shaped path (VERDICT r4
# missing #4): several reference behaviors had only ever run as unit
# tests — two-dataset mixing at second_dataset_ratio=0.875 (the ycbv
# recipe, reference common_ops.py:43), detector-JSON ingest through a test
# CLI (get_detection_results.py:4-32), VOC-style background replacement on
# the LM path (lm_dataset_pytorch.py:489-523), and the lmo->ycbv cfg
# converter. This drives each e2e on generated BOP-layout data, CPU
# platform (never touches the chip — safe to run beside a live train only
# in a quiet window; it IS CPU-heavy).
#
#   bash tools/dress_rehearsal_r5.sh 2>&1 | tee logs/dress_rehearsal_r5.log
set -e
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
export CHECKERPOSE_PLATFORM=cpu

echo "=== [1/5] generate rehearsal dataset (train_real + train_pbr + test + detections)"
python - <<'EOF'
from checkerpose_tpu.data.synthetic import make_synthetic_bop
ds = make_synthetic_bop(
    "/tmp/synth_rehearsal", dataset="synth", n_objects=1, n_scenes=1,
    folders={"train_real": 48, "train_pbr": 48, "test": 12},
    n_vertices=1024, seed=17, raw_cache=False, write_png=True)
print("dataset at", ds)
EOF

echo "=== [2/5] background image dir (VOC-style bg replacement source)"
python - <<'EOF'
import os
import numpy as np
import cv2
os.makedirs("/tmp/synth_bg", exist_ok=True)
rng = np.random.default_rng(3)
for i in range(8):
    img = rng.integers(0, 255, (240, 320, 3)).astype("uint8")
    cv2.imwrite(f"/tmp/synth_bg/bg_{i:02d}.jpg", img)
print("8 backgrounds at /tmp/synth_bg")
EOF

echo "=== [3/5] train leg: two-folder mixing at 0.875 (8-sample batch -> 1 real + 7 pbr)"
rm -rf /tmp/synth_rehearsal_ckpt /tmp/synth_rehearsal_tb
python -u -m checkerpose_tpu.cli.train \
  --cfg tests/fixtures/synth_rehearsal_train.txt --obj_name obj01 \
  --total_iteration 4
python - <<'EOF'
from checkerpose_tpu.data.dataset import mixed_batch_sizes
b1, b2 = mixed_batch_sizes(8, 0.875)
assert (b1, b2) == (1, 7), (b1, b2)
print(f"mixing arithmetic confirmed: batch 8 -> {b1} real + {b2} pbr "
      "(reference common_ops.py:43 semantics)")
EOF

echo "=== [4/5] test leg: detector-JSON ingest through cli.test"
python -u -m checkerpose_tpu.cli.test \
  --cfg tests/fixtures/synth_rehearsal_train.txt --obj_name obj01 \
  --use_latest --eval_output_path /tmp/synth_rehearsal_eval \
  --test_batch_size 4 2>&1 | tail -5
# same leg again but THROUGH the detection JSON (bbox_est path, reference
# get_detection_results.py:4-32): rewrite Detection_reaults in a cfg copy
sed "s#^Detection_reaults = none#Detection_reaults = /tmp/synth_rehearsal/detection_results/synth/synth_detections.json#" \
  tests/fixtures/synth_rehearsal_train.txt > /tmp/synth_rehearsal_det.txt
python -u -m checkerpose_tpu.cli.test \
  --cfg /tmp/synth_rehearsal_det.txt --obj_name obj01 \
  --use_latest --eval_output_path /tmp/synth_rehearsal_eval_det \
  --test_batch_size 4 \
  2>&1 | tail -3

echo "=== [5/5] lm bg-replacement leg (2 steps) + lmo->ycbv converter"
python -u -m checkerpose_tpu.cli.train_lm \
  --cfg tests/fixtures/synth_lm_tiny_bg.txt --total_iteration 2 2>&1 | tail -4
python -u -m checkerpose_tpu.cli.convert_cfg_lmo_to_ycbv \
  --cfg config/lmo/hr18GNN2_res6_gnn3Skip_mlpQuery.txt \
  --out /tmp/converted_ycbv.txt
grep -E "dataset_name|second_dataset_ratio|Detection_reaults" /tmp/converted_ycbv.txt

echo "=== DRESS REHEARSAL COMPLETE"
