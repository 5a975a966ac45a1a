import jax.numpy as jnp
import numpy as np

import synthdata
from autopanostitch_tpu.config import DetectorConfig
from autopanostitch_tpu.ops import doh, matching as mt

CFG = DetectorConfig(max_keypoints=256, num_octaves=3)


def blob_image(size=192):
    y, x = np.mgrid[0:size, 0:size].astype(np.float32)
    img = np.zeros((size, size), np.float32)
    for cx, cy, s in [(50, 50, 4), (140, 60, 7), (90, 140, 10)]:
        img += np.exp(-((x - cx) ** 2 + (y - cy) ** 2) / (2 * s * s))
    return img


def test_detects_blobs_at_right_scales():
    f = doh.extract_doh(jnp.asarray(blob_image()), CFG)
    m = np.asarray(f.mask)
    assert m.sum() >= 3
    xy = np.asarray(f.xy)[m]
    sc = np.asarray(f.scale)[m]
    # each planted blob should have a detection nearby
    for cx, cy, s in [(50, 50, 4), (140, 60, 7), (90, 140, 10)]:
        d = np.linalg.norm(xy - [cx, cy], axis=1)
        k = d.argmin()
        assert d[k] < 3.0, (cx, cy, xy[k])
        assert 0.4 * s < sc[k] < 2.5 * s  # scale in the right ballpark


def test_doh_matching_under_translation():
    img = synthdata.texture(2, 160, 220).mean(-1).astype(np.float32)
    img2 = np.roll(img, 35, axis=1)
    f1 = doh.extract_doh(jnp.asarray(img), CFG)
    f2 = doh.extract_doh(jnp.asarray(img2), CFG)
    idx, m, n = mt.match_pair(f1.desc, f1.mask, f2.desc, f2.mask, ratio=0.75, max_matches=256)
    assert int(n) >= 10
    idx = np.asarray(idx)[np.asarray(m)]
    p1 = np.asarray(f1.xy)[idx[:, 0]]
    p2 = np.asarray(f2.xy)[idx[:, 1]]
    dx = (p2[:, 0] - p1[:, 0] - 35 + 110) % 220 - 110
    assert (np.abs(dx) < 2.5).mean() > 0.6


def test_pipeline_dispatch_surf():
    import jax

    from autopanostitch_tpu.models import features as fstage

    imgs = np.stack([synthdata.texture(s, 96, 96) for s in range(2)]).astype(np.float32)
    sizes = np.array([[96, 96], [96, 96]], np.int32)
    cfg = DetectorConfig(detector="SURF", max_keypoints=128)
    f = fstage.extract_features(jnp.asarray(imgs), sizes, cfg)
    assert f.desc.shape == (2, 128, 128)
    assert int(f.mask.sum()) > 0
