"""KAZE nonlinear scale space (ops/kaze.py): diffusion properties,
detection, and pipeline dispatch.

Reference: `getFeaturePoints.m:33-64` (detectKAZEFeatures option);
Alcantarilla et al., "KAZE Features", ECCV 2012 (PM g2 conductivity,
FED evolution, 70th-percentile contrast factor).
"""

import jax.numpy as jnp
import numpy as np

import synthdata
from autopanostitch_tpu.config import DetectorConfig
from autopanostitch_tpu.ops import kaze, matching as mt
from autopanostitch_tpu.ops.sift import gaussian_blur

CFG = DetectorConfig(max_keypoints=256, num_octaves=3)


def blob_image(size=192):
    y, x = np.mgrid[0:size, 0:size].astype(np.float32)
    img = np.zeros((size, size), np.float32)
    for cx, cy, s in [(50, 50, 4), (140, 60, 7), (90, 140, 10)]:
        img += np.exp(-((x - cx) ** 2 + (y - cy) ** 2) / (2 * s * s))
    return img


def step_edge(size=96):
    """Strong step edge over a LOW-CONTRAST texture. The texture matters:
    the contrast factor k is a gradient percentile, and on an image whose
    only nonzero gradients ARE the edge, k lands on the edge itself and
    (correctly) diffuses it like any typical structure."""
    rng = np.random.default_rng(0)
    img = 0.08 * rng.standard_normal((size, size)).astype(np.float32)
    img[:, size // 2:] += 1.0
    return img


def test_fed_tau_sums_to_T():
    for T in (0.3, 2.0, 17.5):
        taus = kaze.fed_tau(T)
        assert abs(sum(taus) - T) < 1e-9
        assert all(t > 0 for t in taus)
    assert kaze.fed_tau(0.0) == []


def test_diffusion_preserves_mean():
    img = jnp.asarray(synthdata.texture(3, 96, 128).mean(-1).astype(np.float32))
    sigmas = (1.6, 2.26, 3.2, 4.53)
    Ls = kaze.nonlinear_scale_space(img, sigmas)
    m0 = float(img.mean())
    for i in range(len(sigmas)):
        assert abs(float(Ls[i].mean()) - m0) < 2e-3, i


def test_edge_preserved_vs_gaussian():
    """The point of the nonlinear scale space: at equal diffusion time a
    step edge stays much sharper than under Gaussian smoothing."""
    img = jnp.asarray(step_edge())
    sigma = 6.4  # t = sigma^2/2 = 20.5
    Ls = kaze.nonlinear_scale_space(img, (1.6, sigma))
    Ln = np.asarray(Ls[1])
    Lg = np.asarray(gaussian_blur(img, sigma))
    mid = img.shape[1] // 2
    # max horizontal gradient across the edge, away from borders
    gn = np.abs(np.diff(Ln[48, mid - 10 : mid + 10])).max()
    gg = np.abs(np.diff(Lg[48, mid - 10 : mid + 10])).max()
    assert gn > 3.0 * gg, (gn, gg)


def test_detects_blobs_at_right_scales():
    f = kaze.extract_kaze(jnp.asarray(blob_image()), CFG)
    m = np.asarray(f.mask)
    assert m.sum() >= 3
    xy = np.asarray(f.xy)[m]
    sc = np.asarray(f.scale)[m]
    for cx, cy, s in [(50, 50, 4), (140, 60, 7), (90, 140, 10)]:
        d = np.linalg.norm(xy - [cx, cy], axis=1)
        k = d.argmin()
        assert d[k] < 3.0, (cx, cy, xy[k])
        assert 0.4 * s < sc[k] < 2.5 * s


def test_kaze_matching_under_translation():
    img = synthdata.texture(2, 160, 220).mean(-1).astype(np.float32)
    img2 = np.roll(img, 35, axis=1)
    f1 = kaze.extract_kaze(jnp.asarray(img), CFG)
    f2 = kaze.extract_kaze(jnp.asarray(img2), CFG)
    idx, m, n = mt.match_pair(
        f1.desc, f1.mask, f2.desc, f2.mask, ratio=0.75, max_matches=256
    )
    assert int(n) >= 10
    idx = np.asarray(idx)[np.asarray(m)]
    p1 = np.asarray(f1.xy)[idx[:, 0]]
    p2 = np.asarray(f2.xy)[idx[:, 1]]
    dx = (p2[:, 0] - p1[:, 0] - 35 + 110) % 220 - 110
    assert (np.abs(dx) < 2.5).mean() > 0.6


def test_pipeline_dispatch_kaze():
    from autopanostitch_tpu.models import features as fstage

    imgs = np.stack([synthdata.texture(s, 96, 96) for s in range(2)]).astype(
        np.float32
    )
    sizes = np.array([[96, 96], [96, 96]], np.int32)
    cfg = DetectorConfig(detector="KAZE", max_keypoints=128)
    f = fstage.extract_features(jnp.asarray(imgs), sizes, cfg)
    assert f.desc.shape == (2, 128, 128)
    assert int(f.mask.sum()) > 0
