"""Generate the round-3 multi-object (LM-style) synthetic BOP dataset.

4 objects x 1024 train images each (round-robin across 2 scenes) + 32 test
images each, full BOP layout + detections + pre-decoded frame cache. Drives
the `_lm` recipe (pretrain_lm -> train_lm -> test_lm: one shared estimator,
stacked per-object KNN tables) at scale, mirroring the reference 13-object
Linemod benchmark flow (`/root/reference/checkerpose/train_lm.py`) on
synthetic data.
"""
import sys
import time

from checkerpose_tpu.data.synthetic import make_synthetic_bop

ROOT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth_lm"

t0 = time.time()
ds = make_synthetic_bop(
    ROOT,
    dataset="synth",
    n_objects=4,
    n_scenes=2,
    folders={"train_real": 2048, "test": 64},  # x2 scenes = 4096 + 128
    n_vertices=1024,
    seed=11,
    raw_cache=True,
    write_png=True,
    progress=True,
)
print(f"done: {ds} in {time.time() - t0:.0f}s", flush=True)
