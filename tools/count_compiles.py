"""Enumerate every XLA executable compiled during a bench workload.

The axon relay charges ~17 s of AOT round-trip per DISTINCT executable, so
first-run latency is executable COUNT x 17 s, not XLA work.  This tool runs
a workload on the CPU backend (same trace -> same executable set) with
`jax_log_compiles` and prints each compiled computation with its shape
signature plus the total count — the number to minimize.

Usage:  python tools/count_compiles.py [6view|pano100|church|cmu0] ...
"""

import logging
import os
import re
import sys
import traceback
from collections import Counter

os.environ.setdefault("AUTOPANO_DISABLE_COMPILE_CACHE", "1")
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_log_compiles", True)

compiles = []


class _Handler(logging.Handler):
    def emit(self, record):
        msg = record.getMessage()
        m = re.search(r"Compiling ([^\s]+)", msg)
        if m:
            site = ""
            for fr in reversed(traceback.extract_stack()):
                if "/root/repo/" in fr.filename and "count_compiles" not in fr.filename:
                    site = f"{fr.filename.replace('/root/repo/', '')}:{fr.lineno}"
                    break
            compiles.append((m.group(1), msg, site))


handler = _Handler()
for name in ("jax._src.interpreters.pxla", "jax._src.dispatch", "jax"):
    lg = logging.getLogger(name)
    lg.addHandler(handler)
    lg.setLevel(logging.DEBUG)


def run_6view():
    import numpy as np

    import bench
    from autopanostitch_tpu.config import (
        DetectorConfig, ImageMatchConfig, MatchingConfig, StitchConfig,
    )
    from autopanostitch_tpu.models import pipeline
    from autopanostitch_tpu.utils.image_io import ImageSet

    views = bench.load_views()
    sizes = np.array([v.shape[:2] for v in views], np.int32)
    stack = (np.stack(views) * 255).astype(np.uint8)
    iset = ImageSet(images=stack, sizes=sizes, names=[f"v{k}" for k in range(len(views))])
    cfg = StitchConfig(
        detector=DetectorConfig(max_keypoints=1024, num_octaves=4),
        matching=MatchingConfig(max_matches_per_pair=512),
        image_match=ImageMatchConfig(ransac_batch=512),
    )
    pipeline.stitch(iset, cfg)


def run_pano100():
    import numpy as np

    import synthdata
    from autopanostitch_tpu.config import (
        BlendConfig, DetectorConfig, ImageMatchConfig, MatchingConfig,
        RenderConfig, StitchConfig, StraightenConfig,
    )
    from autopanostitch_tpu.models import pipeline
    from autopanostitch_tpu.utils.image_io import ImageSet

    n_views = 100
    env = synthdata.smooth_texture(7, 768, 2048)
    w, h = 384, 288
    yaw = 2 * np.pi / n_views
    views = [
        synthdata.render_pinhole_from_equirect(
            env, synthdata.rot_y(i * yaw).T, 350.0, w, h, "bilinear")
        for i in range(n_views)
    ]
    stack = (np.stack(views) * 255).astype(np.uint8)
    sizes = np.tile(np.array([h, w], np.int32), (n_views, 1))
    iset = ImageSet(images=stack, sizes=sizes, names=[f"v{k}" for k in range(n_views)])
    cfg = StitchConfig(
        detector=DetectorConfig(max_keypoints=512, num_octaves=3),
        matching=MatchingConfig(max_matches_per_pair=256),
        image_match=ImageMatchConfig(ransac_batch=256, max_iter=256),
        straighten=StraightenConfig(enabled=False),
        render=RenderConfig(projections=("spherical",)),
        blend=BlendConfig(mode="multiband"),
    )
    pipeline.stitch(iset, cfg)


WORKLOADS = {"6view": run_6view, "pano100": run_pano100}


def main():
    names = sys.argv[1:] or ["6view"]
    for nm in names:
        compiles.clear()
        WORKLOADS[nm]()
        # the logger double-fires per compile; dedupe exact (name, msg) runs
        uniq = []
        for c in compiles:
            if not uniq or uniq[-1][:2] != c[:2]:
                uniq.append(c)
        print(f"\n=== {nm}: {len(uniq)} compiled executables ===")
        by_site = Counter((c[0], c[2]) for c in uniq)
        for (fn, site), cnt in by_site.most_common():
            print(f"{cnt:4d}  {fn:40s} {site}")
        print("\n--- full log (name + signature head) ---")
        for fn, msg, site in uniq:
            sig = msg.replace("\n", " ")[:200]
            print(f"{site:50s} {sig}")


if __name__ == "__main__":
    main()
