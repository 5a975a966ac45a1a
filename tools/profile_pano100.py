"""One-off: where does the pano100 wall time go on the real chip?

Prints per-stage walls, the upload cost, and the unattributed glue gap.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
    ),
)

from autopanostitch_tpu.utils import compile_cache

compile_cache.enable()

import jax
import jax.numpy as jnp
import numpy as np

import bench
from autopanostitch_tpu.models import pipeline
from autopanostitch_tpu.utils.image_io import ImageSet
from autopanostitch_tpu.utils.timing import StageTimer

b = bench.build_pano(int(os.environ.get("NVIEWS", "100")))
iset, cfg, stack, sizes = b["iset"], b["cfg"], b["stack"], b["sizes"]

t0 = time.time()
pipeline.stitch(iset, cfg)
print(f"warm (first) run: {time.time() - t0:.1f}s", flush=True)

out = {}
for rep in range(2):
    timer = StageTimer(verbose=False)
    t0 = time.time()
    pipeline.stitch(iset, cfg, timer=timer)
    wall = time.time() - t0
    stages = {}
    for k, v in timer.durations:
        stages[k] = round(stages.get(k, 0.0) + v, 3)
    out[f"host_input_run{rep}"] = {
        "wall_s": round(wall, 3),
        "stages": stages,
        "glue_s": round(wall - sum(stages.values()), 3),
    }

# upload cost alone
t0 = time.time()
dev = jnp.asarray(stack)
jax.block_until_ready(dev)
out["upload_s"] = round(time.time() - t0, 3)
out["upload_mb"] = round(stack.nbytes / 1e6, 1)

iset_dev = ImageSet(images=dev, sizes=sizes, names=iset.names)
pipeline.stitch(iset_dev, cfg)
timer = StageTimer(verbose=False)
t0 = time.time()
pipeline.stitch(iset_dev, cfg, timer=timer)
wall = time.time() - t0
stages = {}
for k, v in timer.durations:
    stages[k] = round(stages.get(k, 0.0) + v, 3)
out["dev_input"] = {
    "wall_s": round(wall, 3),
    "stages": stages,
    "glue_s": round(wall - sum(stages.values()), 3),
}

print(json.dumps(out, indent=2))
