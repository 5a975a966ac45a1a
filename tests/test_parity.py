"""Stage-parity regression: diff fresh runs against the recorded goldens.

The goldens (tests/goldens/*.npz, written by tools/record_parity.py) are
per-stage dumps of BASELINE.json configs 1-4 in miniature. These tests
catch silent drift anywhere in the pipeline: feature extraction, match
verification (H, inlier counts, acceptance), panorama discovery, bundle
adjustment (focals, rotations), straightening, gain compensation, and the
rendered output statistics. Tolerances allow for cross-version numeric
noise but not behavioral change; after an INTENDED change, re-record with
`python tools/record_parity.py`.
"""

import os

import numpy as np
import pytest

import parity_scenes

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _load(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden {name}.npz not recorded")
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


@pytest.mark.parametrize("scene", list(parity_scenes.SCENES))
def test_stage_parity(scene):
    golden = _load(scene)
    fresh = parity_scenes.run_scene(scene)

    assert set(fresh) == set(golden), (
        f"artifact keys changed: +{set(fresh) - set(golden)} "
        f"-{set(golden) - set(fresh)}"
    )

    # discrete structure: exact
    np.testing.assert_array_equal(fresh["pairs"], golden["pairs"])
    np.testing.assert_array_equal(fresh["accepted"], golden["accepted"])
    np.testing.assert_array_equal(fresh["components"], golden["components"])
    assert fresh["n_panoramas"] == golden["n_panoramas"]

    # keypoint counts: tiny tolerance (borderline extrema can flip on
    # library-version FP changes)
    np.testing.assert_allclose(
        fresh["n_keypoints"], golden["n_keypoints"], rtol=0.02, atol=3
    )
    np.testing.assert_allclose(
        fresh["num_inliers"], golden["num_inliers"], rtol=0.05, atol=5
    )

    for k, gv in golden.items():
        fv = fresh[k]
        if k.endswith("_shape"):
            np.testing.assert_allclose(fv, gv, atol=2)  # canvas rounding
        elif k.endswith("_coverage"):
            np.testing.assert_allclose(fv, gv, atol=0.01)
        elif k.endswith("_mean"):
            np.testing.assert_allclose(fv, gv, atol=1.5)  # uint8 levels
        elif k.endswith("H") or k.endswith("H_abs"):
            np.testing.assert_allclose(fv, gv, rtol=0.02, atol=0.05)
        elif k.endswith("_f"):
            np.testing.assert_allclose(fv, gv, rtol=0.005)
        elif k.endswith("_R"):
            np.testing.assert_allclose(fv, gv, atol=0.01)
        elif "gains" in k:
            np.testing.assert_allclose(fv, gv, rtol=0.01, atol=0.01)
        elif k.endswith("straightened"):
            assert bool(fv) == bool(gv)
