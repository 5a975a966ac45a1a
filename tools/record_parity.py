"""Record the stage-parity goldens under tests/goldens/.

Runs the deterministic parity scenes (tests/parity_scenes.py — miniature
versions of BASELINE.json configs 1-4) on the CPU backend with the same
virtual-device setup the test suite uses, and stores the per-stage
artifacts as .npz goldens. Re-run after an INTENDED behavior change:

    python tools/record_parity.py [scene ...]

POLICY: goldens must be re-recorded IN THE SAME COMMIT as any change that
alters acceptance/estimation behavior, after auditing the diff against the
scenes' known ground truth (they are synthetic — focal/membership truth is
available). A commit that leaves test_parity red on main is a process bug,
not a tolerable TODO. (Round-3 postmortem: commit 014a927 changed graph
acceptance and shipped without re-recording; the drift net stayed red for
the rest of the round.)
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np  # noqa: E402

import parity_scenes  # noqa: E402


def main(argv):
    names = argv or list(parity_scenes.SCENES)
    out_dir = os.path.join(REPO, "tests", "goldens")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        print(f"recording {name} ...", flush=True)
        arts = parity_scenes.run_scene(name)
        path = os.path.join(out_dir, f"{name}.npz")
        np.savez_compressed(path, **arts)
        print(f"  wrote {path} ({len(arts)} arrays)")


if __name__ == "__main__":
    main(sys.argv[1:])
