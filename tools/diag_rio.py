"""Per-image diagnosis of the Rio thumbnail sheet (VERDICT r3 item 7).

The reference's Rio sample sheet slices into 56 real ~78 px photographs
(`dataset_samples_rio.png`, blank slots trimmed). Round 3 recovered
52/56 into one panorama; the round-4 default pipeline (distortion-aware
BA + rescue-union + evidence floor) recovers ALL 56, split into two
panoramas (41 + 15). This tool produces the evidence table for
docs/ROUND4.md by running ONLY the graph stages (extract -> global
match -> verify -> rescue -> connected components; membership is fixed
before BA/render, pipeline.stitch lines 536-555) and then probing:

  - any non-member view: keypoint count, texture energy, best per-pair
    matches against index-window and vote-affinity neighbours at the
    rescue's own most permissive setting (pairwise ratio 0.8) plus the
    RANSAC inlier count of that pair;
  - any fragmentation: the strongest CROSS-COMPONENT pairs by putative
    vote affinity, each re-matched at ratio 0.8 + RANSAC-verified, so
    the boundary's best-case evidence (nm, ni) is measured against the
    acceptance rule (ni > 8 + 0.3 nf, evidence floor min_pts + 5).

If a view fails at DETECTION (few keypoints) the limit is scale-space
information; if it matches but fails VERIFICATION the limit is
geometric support; if the best cross-component pair's inliers sit below
the floor, the split is information-limited, not an optimizer bug.

Usage: python tools/diag_rio.py [--save-tiles DIR] [--probe-top K]
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
from autopanostitch_tpu.models import pipeline  # noqa: E402
from autopanostitch_tpu.ops import matching as mt  # noqa: E402
from autopanostitch_tpu.ops import ransac  # noqa: E402
from autopanostitch_tpu.models.pipeline import host_prng_key  # noqa: E402
from autopanostitch_tpu.utils import real_data  # noqa: E402


def texture_energy(img: np.ndarray) -> float:
    """Mean gradient magnitude of the grayscale image — the sweep's
    texture-cutoff analog for real photos."""
    g = img.mean(-1)
    gx = np.diff(g, axis=1)
    gy = np.diff(g, axis=0)
    return float(np.abs(gx).mean() + np.abs(gy).mean())


def probe_pair(feats, i: int, j: int, cfg) -> tuple[int, int]:
    """(raw ratio-0.8 matches, RANSAC projective inliers) for pair (i, j)."""
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
    return nm, ni


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--save-tiles", default=None)
    ap.add_argument("--probe-top", type=int, default=10)
    args = ap.parse_args()

    tiles = real_data.load_montage_tiles("rio")
    n = len(tiles)
    print(f"rio sheet: {n} tiles", flush=True)
    iset = real_data.image_set_from_arrays(tiles, 800, 800)
    cfg = StitchConfig()
    key = host_prng_key(0)

    t0 = time.time()
    feats, _images = pipeline._extract(iset, cfg)
    print(f"extract {time.time() - t0:.0f}s", flush=True)

    t0 = time.time()
    pairs, pair_idx, pair_mask, counts, votes = pipeline.match_features(
        feats, cfg, return_votes=True
    )
    if len(pairs):
        pairs, pair_idx, pair_mask = pipeline.select_candidate_pairs(
            pairs, pair_idx, pair_mask, counts, cfg.image_match.m_brown_lowe
        )
    graph = pipeline.verify_matches(feats, pairs, pair_idx, pair_mask, counts, cfg, key)
    comps = pipeline.connected_components(n, graph.pairs, graph.accepted)
    graph, comps, adopted = pipeline.pairwise_rescue(
        feats, graph, comps, n, cfg, key, votes=votes
    )
    labels = np.asarray(comps)
    groups: dict[int, list[int]] = {}
    for i, lab in enumerate(labels):
        groups.setdefault(int(lab), []).append(i)
    # panorama components = graph components with >= 2 views
    panos = sorted([g for g in groups.values() if len(g) >= 2],
                   key=len, reverse=True)
    print(f"graph {time.time() - t0:.0f}s: components "
          f"{[len(c) for c in panos]} rescue={adopted}", flush=True)
    members = sorted({m for c in panos for m in c})
    missing = [i for i in range(n) if i not in members]
    kp_count = np.asarray(feats.mask).sum(-1).astype(int)

    out = {
        "n_tiles": n,
        "component_sizes": [len(c) for c in panos],
        "n_stitched": len(members),
        "missing": missing,
        "accepted_pairs": int(np.asarray(graph.accepted).sum()),
        "rescue_adopted": bool(adopted),
        "per_missing": {},
        "cross_component": [],
    }

    votes_np = np.asarray(votes)
    votes_sym = votes_np + votes_np.T

    # --- non-member diagnosis (detection vs verification limited) ---
    for i in missing:
        rec = {
            "keypoints": int(kp_count[i]),
            "texture_energy": round(texture_energy(tiles[i]), 4),
            "tile_shape": list(tiles[i].shape[:2]),
            "best_pairs": [],
        }
        cands = set(range(max(0, i - 3), min(n, i + 4))) - {i}
        top = np.argsort(votes_sym[i])[::-1][:6]
        cands |= {int(t) for t in top if votes_sym[i][t] > 0}
        scored = []
        for j in sorted(cands):
            nm, ni = probe_pair(feats, i, j, cfg)
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

    # --- fragmentation diagnosis: strongest cross-component pairs ---
    if len(panos) > 1:
        main_c = set(panos[0])
        for other in panos[1:]:
            cand = []
            for i in other:
                for j in main_c:
                    if votes_sym[i][j] > 0:
                        cand.append((int(votes_sym[i][j]), i, j))
            cand.sort(reverse=True)
            for v, i, j in cand[: args.probe_top]:
                nm, ni = probe_pair(feats, i, j, cfg)
                need = int(np.ceil(8 + 0.3 * nm))
                rec = {
                    "i": i, "j": j, "votes": v,
                    "raw_matches_ratio08": nm, "ransac_inliers": ni,
                    "accept_needs_ni_gt": need,
                    "kp_i": int(kp_count[i]), "kp_j": int(kp_count[j]),
                    "tex_i": round(texture_energy(tiles[i]), 3),
                    "tex_j": round(texture_energy(tiles[j]), 3),
                }
                out["cross_component"].append(rec)
                print(f"cross {i}<->{j}: votes={v} nm={nm} ni={ni} "
                      f"(needs >{need}, floor 9)", flush=True)

    out["member_keypoints_median"] = (
        int(np.median(kp_count[members])) if members else 0
    )
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
    print(json.dumps({k: v for k, v in out.items()
                      if k not in ("per_missing", "cross_component")}))


if __name__ == "__main__":
    main()
