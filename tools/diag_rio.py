"""Per-image diagnosis of the Rio thumbnail sheet (VERDICT r3 item 7).

The reference's Rio sample sheet slices into 56 real ~78 px photographs
(`dataset_samples_rio.png`, one blank slot trimmed). The default pipeline
recovers 52/56 into one panorama (r3); this tool identifies the missing
views and measures WHY each fails, producing the evidence table for
docs/ROUND4.md:

  - stitch the full sheet with the default config, list membership
  - for every non-member: keypoint count, texture energy, and the best
    per-pair match against each of its montage-grid neighbours (ratio
    0.8 pairwise — the rescue's own, most permissive, setting) plus the
    RANSAC inlier count of that pair

If a non-member fails at DETECTION (few keypoints) the limit is
scale-space information; if it matches but fails VERIFICATION the limit
is geometric support; if neighbours themselves are absent the slot is
content-blind (montage artifact).

Usage: python tools/diag_rio.py [--save-tiles DIR]
Writes docs/results/rio_diagnosis.json.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from autopanostitch_tpu.config import StitchConfig  # noqa: E402
from autopanostitch_tpu.models import features as features_stage  # noqa: E402
from autopanostitch_tpu.models import pipeline  # noqa: E402
from autopanostitch_tpu.ops import matching as mt  # noqa: E402
from autopanostitch_tpu.ops import ransac  # noqa: E402
from autopanostitch_tpu.ops import geometry as geo  # noqa: E402
from autopanostitch_tpu.utils import real_data  # noqa: E402


def texture_energy(img: np.ndarray) -> float:
    """Mean gradient magnitude of the grayscale image — the sweep's
    texture-cutoff analog for real photos."""
    g = img.mean(-1)
    gx = np.diff(g, axis=1)
    gy = np.diff(g, axis=0)
    return float(np.abs(gx).mean() + np.abs(gy).mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--save-tiles", default=None)
    args = ap.parse_args()

    tiles = real_data.load_montage_tiles("rio")
    n = len(tiles)
    print(f"rio sheet: {n} tiles", flush=True)
    iset = real_data.image_set_from_arrays(tiles, 800, 800)

    t0 = time.time()
    res = pipeline.stitch(iset, StitchConfig())
    wall = time.time() - t0
    members = sorted(
        {int(m) for p in res.panoramas for m in np.asarray(p["members"])}
    )
    sizes = sorted((len(p["members"]) for p in res.panoramas), reverse=True)
    missing = [i for i in range(n) if i not in members]
    print(f"stitch {wall:.0f}s: panoramas {sizes}, missing {missing}", flush=True)

    feats = res.features
    kp_count = np.asarray(feats.mask).sum(-1).astype(int)

    out = {
        "n_tiles": n,
        "panorama_sizes": sizes,
        "n_stitched": int(sum(sizes)),
        "missing": missing,
        "accepted_pairs": int(np.asarray(res.graph.accepted).sum()),
        "per_missing": {},
    }

    # montage-grid neighbours: the sheet is row-major (12, 5) with blank
    # slots trimmed — neighbour ordering in tile index space still puts
    # spatially adjacent photographs nearby, so probe a +-3 index window
    # plus the views with the strongest putative-count affinity.
    votes = np.asarray(res.graph.counts)
    votes = votes + votes.T

    cfg = StitchConfig()
    for i in missing:
        rec = {
            "keypoints": int(kp_count[i]),
            "texture_energy": round(texture_energy(tiles[i]), 4),
            "tile_shape": list(tiles[i].shape[:2]),
            "best_pairs": [],
        }
        cands = set(range(max(0, i - 3), min(n, i + 4))) - {i}
        top = np.argsort(votes[i])[::-1][:6]
        cands |= {int(t) for t in top if votes[i][t] > 0}
        scored = []
        for j in sorted(cands):
            idx, m, nm = mt.match_pair(
                feats.desc[i], feats.mask[i], feats.desc[j], feats.mask[j],
                ratio=0.8, max_matches=cfg.matching.max_matches_per_pair,
            )
            nm = int(np.asarray(nm))
            ni = 0
            if nm >= 6:
                idx_np = np.asarray(idx)
                xy_a = jnp.asarray(feats.xy[i])[idx_np[:, 0]]
                xy_b = jnp.asarray(feats.xy[j])[idx_np[:, 1]]
                r = ransac.ransac_fit(
                    xy_a, xy_b, jnp.asarray(m),
                    jax.random.PRNGKey(0), model="projective", batch=256,
                )
                ni = int(np.asarray(r.num_inliers))
            scored.append((nm, ni, j))
        scored.sort(reverse=True)
        for nm, ni, j in scored[:4]:
            rec["best_pairs"].append({
                "other": j, "other_in_pano": j in members,
                "raw_matches_ratio08": nm, "ransac_inliers": ni,
            })
        out["per_missing"][str(i)] = rec
        print(f"view {i}: kp={rec['keypoints']} tex={rec['texture_energy']}"
              f" best={rec['best_pairs'][:2]}", flush=True)

    # context: distribution over the members for comparison
    out["member_keypoints_median"] = int(np.median(kp_count[members])) if members else 0
    out["member_texture_median"] = round(
        float(np.median([texture_energy(tiles[i]) for i in members])), 4
    ) if members else 0.0

    if args.save_tiles:
        from PIL import Image

        d = Path(args.save_tiles)
        d.mkdir(parents=True, exist_ok=True)
        for i in missing:
            Image.fromarray(
                (np.clip(tiles[i], 0, 1) * 255).astype(np.uint8)
            ).save(d / f"rio_missing_{i:02d}.png")

    dest = Path(__file__).resolve().parents[1] / "docs/results/rio_diagnosis.json"
    dest.write_text(json.dumps(out, indent=2))
    print(json.dumps({k: v for k, v in out.items() if k != "per_missing"}))


if __name__ == "__main__":
    main()
