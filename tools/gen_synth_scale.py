"""Generate the round-2 accuracy-proof synthetic BOP dataset.

8192 train + 256 test images of one 1024-vertex luminance-textured blob,
full BOP layout + detections + pre-decoded frame cache (data/framestore.py).
See NOTES_ROUND2.md item 1 for why the texture is luminance-dominant.
"""
import sys
import time

from checkerpose_tpu.data.synthetic import make_synthetic_bop

ROOT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth_scale3"  # = config/synth bop_path

t0 = time.time()
ds = make_synthetic_bop(
    ROOT,
    dataset="synth",
    n_objects=1,
    n_scenes=2,
    folders={"train_real": 4096, "test": 128},  # x2 scenes = 8192 + 256
    n_vertices=1024,
    seed=7,
    raw_cache=True,
    write_png=True,
    progress=True,
)
print(f"done: {ds} in {time.time() - t0:.0f}s", flush=True)
