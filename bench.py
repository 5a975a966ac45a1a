"""Headline benchmark: end-to-end stitch throughput on one chip.

Prints ONE JSON line:
  {"metric": "e2e_stitch_mpix_per_sec", "value": N, "unit": "Mpix/s",
   "vs_baseline": N, ...}

Workload: 6 overlapping 640x512 views cropped from a real photo, full
pipeline (SIFT -> global matching -> RANSAC verification -> panorama
discovery -> composite). Wall time is the steady-state run (2nd call; the
1st run pays XLA compilation, which is cached across calls of the same
shape and reported separately).

vs_baseline: the MATLAB reference publishes no numbers (BASELINE.md); we
compare against a conservative estimate of 0.1 Mpix/s for the reference's
per-dataset wall time at its default operating point (800x800 inputs,
minutes-scale end-to-end runs per its own README performance remarks).
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_EST_MPIX_S = 0.1


def load_views():
    from PIL import Image

    path = "/root/reference/assets/grand_canyon_01.jpeg"
    if os.path.exists(path):
        env = np.asarray(Image.open(path).convert("RGB").resize((1920, 900)), np.float32) / 255.0
    else:  # fallback: synthetic
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
        import synthdata

        env = synthdata.texture(0, 900, 1920)
    boxes = [(i * 256, 20 * (i % 2), 640, 512) for i in range(6)]
    views = [env[y : y + h, x : x + w] for (x, y, w, h) in boxes]
    return views


def main():
    from autopanostitch_tpu.config import (
        DetectorConfig,
        ImageMatchConfig,
        MatchingConfig,
        StitchConfig,
    )
    from autopanostitch_tpu.models import pipeline
    from autopanostitch_tpu.utils.image_io import ImageSet

    views = load_views()
    sizes = np.array([v.shape[:2] for v in views], np.int32)
    # uint8 stack: 4x cheaper host->device upload (converted on device)
    stack = (np.stack(views) * 255).astype(np.uint8)
    iset = ImageSet(images=stack, sizes=sizes, names=[f"v{k}" for k in range(len(views))])
    cfg = StitchConfig(
        detector=DetectorConfig(max_keypoints=1024, num_octaves=4),
        matching=MatchingConfig(max_matches_per_pair=512),
        image_match=ImageMatchConfig(ransac_batch=512),
    )

    t0 = time.time()
    res = pipeline.stitch(iset, cfg)
    compile_s = time.time() - t0

    t0 = time.time()
    res = pipeline.stitch(iset, cfg)
    steady_s = time.time() - t0

    mpix = stack.shape[0] * stack.shape[1] * stack.shape[2] / 1e6
    value = mpix / steady_s
    n_kp = int(np.asarray(res.features.mask).sum())
    print(
        json.dumps(
            {
                "metric": "e2e_stitch_mpix_per_sec",
                "value": round(value, 3),
                "unit": "Mpix/s",
                "vs_baseline": round(value / REFERENCE_EST_MPIX_S, 2),
                "steady_s": round(steady_s, 3),
                "compile_s": round(compile_s, 1),
                "n_images": len(views),
                "n_keypoints": n_kp,
                "n_panoramas": len(res.panoramas),
                "accepted_pairs": int(res.graph.accepted.sum()),
            }
        )
    )


if __name__ == "__main__":
    main()
