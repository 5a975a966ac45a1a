"""Regenerate docs/results/: stitch every real capture set recovered from
the reference's dataset sample sheets (utils/real_data.py) plus the church
trio, and save the cropped panoramas as JPEGs.

Run on the real chip (or through tools/tpu_worker.py to amortize the axon
session setup). Each sheet is a genuine multi-photo capture set from the
reference's own README montages (`/root/reference/assets/dataset_samples_*`),
so these images are the repo's visual evidence on real photographs.

Measured (round 3, real v5e chip, includes compile):
  cmu0 37/38 one ~360-degree ring | shanghai 30/30 | grandcanyon 35/35 |
  ucsb4 14/14 | yellowstone 22/22 (2-row rig) | rio 52/56 in 4 panoramas
  (78 px thumbnails, two-level auto upsampling) | church trio 3/3.
"""

import os
import time

import numpy as np
from PIL import Image

from autopanostitch_tpu.config import StitchConfig
from autopanostitch_tpu.models import pipeline
from autopanostitch_tpu.utils import image_io, real_data

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "results")


def save(img, name, max_w=1600):
    im = Image.fromarray(np.asarray(img))
    if im.width > max_w:
        im = im.resize((max_w, int(im.height * max_w / im.width)), Image.LANCZOS)
    im.save(os.path.join(OUT, name), quality=88)
    print("saved", name, im.size, flush=True)


def run(name, tiles, cfg=None):
    cfg = cfg or StitchConfig()
    iset = real_data.image_set_from_arrays(tiles, 800, 800)
    t0 = time.time()
    res = pipeline.stitch(iset, cfg)
    panos = sorted(res.panoramas, key=lambda p: -len(p["members"]))
    print(name, "t=%.1f" % (time.time() - t0), "panos:",
          [len(p["members"]) for p in panos], flush=True)
    for k, p in enumerate(panos[:2]):
        proj = p.get("projections_cropped") or p["projections"]
        img = proj["spherical"] if "spherical" in proj else next(iter(proj.values()))
        suffix = "" if k == 0 else "_b"
        save(img, f"{name}{suffix}.jpg")


def main():
    os.makedirs(OUT, exist_ok=True)
    for name in ["CMU0", "shanghai", "grandcanyon", "ucsb4", "yellowstone", "rio"]:
        try:
            run(name.lower() if name != "CMU0" else "cmu0",
                real_data.load_montage_tiles(name))
        except Exception:
            import traceback

            traceback.print_exc()

    iset = image_io.load_image_set(real_data.church_paths())
    res = pipeline.stitch(iset, StitchConfig())
    panos = sorted(res.panoramas, key=lambda p: -len(p["members"]))
    print("church panos:", [len(p["members"]) for p in panos], flush=True)
    proj = panos[0].get("projections_cropped") or panos[0]["projections"]
    img = proj["spherical"] if "spherical" in proj else next(iter(proj.values()))
    save(img, "church.jpg")


if __name__ == "__main__":
    main()
