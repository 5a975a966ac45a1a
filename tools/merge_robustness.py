"""Merge robustness-sweep shards into one artifact with a fresh summary.

The sweep (tools/robustness_sweep.py) is deterministic per scene_id —
`sample_scene(sid)` derives every parameter from the sid and the stitch
runs a fixed config — so a campaign can be extended by running new sid
ranges and merging, provided the config and code path are unchanged.
Use --check to verify determinism first: it re-runs a few scene_ids from
an existing shard and asserts the recorded metrics reproduce.

Usage:
  python tools/merge_robustness.py --check docs/results/robustness_r4_default.json --sids 0 17 54
  python tools/merge_robustness.py --out docs/results/robustness_r5_default.json \
      docs/results/robustness_r4_default.json docs/results/robustness_r5_ext.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("shards", nargs="*", help="sweep JSON files to merge")
    ap.add_argument("--out", default=None)
    ap.add_argument("--check", default=None, help="shard to spot-check")
    ap.add_argument("--sids", type=int, nargs="*", default=[0, 17, 54])
    args = ap.parse_args()

    if args.check:
        import jax

        jax.config.update("jax_platforms", "cpu")
        import robustness_sweep as rs

        with open(args.check) as fh:
            ref = {s["scene_id"]: s for s in json.load(fh)["scenes"]}
        cfg = rs._sweep_config()
        ok = True
        for sid in args.sids:
            rec = rs.run_scene(rs.sample_scene(sid, 12), cfg)
            want = ref[sid]
            for k in ("artifact", "psnr_db", "coverage_ratio", "ferr_pct"):
                if rec[k] != want[k]:
                    ok = False
                    print(f"scene {sid}: {k} {rec[k]!r} != recorded {want[k]!r}")
            print(f"scene {sid}: {'reproduced' if ok else 'MISMATCH'}"
                  f" (artifact={rec['artifact']}, psnr={rec['psnr_db']})")
        if not ok:
            raise SystemExit("determinism check FAILED — do not merge")
        print("determinism check passed")
        return

    import robustness_sweep as rs

    scenes, meta = {}, None
    for path in args.shards:
        with open(path) as fh:
            d = json.load(fh)
        meta = meta or d
        for s in d["scenes"]:
            if s["scene_id"] in scenes:
                raise SystemExit(f"duplicate scene_id {s['scene_id']} in {path}")
            scenes[s["scene_id"]] = s
    records = [scenes[k] for k in sorted(scenes)]
    payload = {
        "platform": meta.get("platform", "cpu"),
        "view_size": meta.get("view_size"),
        "merged_from": args.shards,
        "summary": rs.summarize(records),
        "scenes": records,
    }
    with open(args.out, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps(payload["summary"]))
    print(f"wrote {args.out} ({len(records)} scenes)")


if __name__ == "__main__":
    main()
