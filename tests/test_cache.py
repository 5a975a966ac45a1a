import numpy as np

import synthdata
from autopanostitch_tpu.utils.cache import StageCache, fingerprint


def test_fingerprint_stable_and_sensitive():
    f1 = fingerprint(["a", "b"], np.array([[1, 2]]), "cfg")
    f2 = fingerprint(["a", "b"], np.array([[1, 2]]), "cfg")
    f3 = fingerprint(["a", "c"], np.array([[1, 2]]), "cfg")
    assert f1 == f2 and f1 != f3


def test_cache_roundtrip(tmp_path):
    c = StageCache(str(tmp_path))
    c.save("k1", "features", xy=np.ones((4, 2)), mask=np.array([True, False, True, True]))
    out = c.load("k1", "features")
    assert set(out) == {"xy", "mask"}
    np.testing.assert_array_equal(out["xy"], np.ones((4, 2)))
    assert c.load("k1", "other") is None
    assert c.load("k2", "features") is None


def test_pipeline_feature_cache(tmp_path):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from autopanostitch_tpu.config import DetectorConfig, ImageMatchConfig, MatchingConfig, StitchConfig, StraightenConfig
    from autopanostitch_tpu.models import pipeline
    from autopanostitch_tpu.utils.image_io import ImageSet

    env = synthdata.texture(0, 400, 760)
    views = [env[0:380, 0:420], env[20:400, 320:740]]
    sizes = np.array([v.shape[:2] for v in views], np.int32)
    stack = np.zeros((2, 384, 420, 3), np.float32)
    for k, v in enumerate(views):
        stack[k, : v.shape[0], : v.shape[1]] = v
    iset = ImageSet(images=stack, sizes=sizes, names=["a", "b"])
    cfg = StitchConfig(
        detector=DetectorConfig(max_keypoints=384, num_octaves=3),
        matching=MatchingConfig(max_matches_per_pair=256),
        image_match=ImageMatchConfig(ransac_batch=256),
        straighten=StraightenConfig(force_planar_scan=True),
    )
    r1 = pipeline.stitch(iset, cfg, cache_dir=str(tmp_path))
    assert len(list(tmp_path.glob("*_features.npz"))) == 1
    assert len(list(tmp_path.glob("*_graph.npz"))) == 1
    assert len(list(tmp_path.glob("*_ba*.npz"))) == 1
    r2 = pipeline.stitch(iset, cfg, cache_dir=str(tmp_path))  # loads from cache
    np.testing.assert_array_equal(np.asarray(r1.features.xy), np.asarray(r2.features.xy))
    np.testing.assert_array_equal(r1.graph.H, r2.graph.H)
    np.testing.assert_array_equal(r1.graph.accepted, r2.graph.accepted)
    assert len(r2.panoramas) == 1
    # cached BA reproduces the cameras / planar classification
    p1, p2 = r1.panoramas[0], r2.panoramas[0]
    assert p1["ba"]["no_rotation"] == p2["ba"]["no_rotation"]
    np.testing.assert_allclose(
        np.asarray(p1["ba"]["cameras"].R), np.asarray(p2["ba"]["cameras"].R)
    )
    # final output identical from a warm cache
    for mode in p1["projections"]:
        np.testing.assert_array_equal(p1["projections"][mode], p2["projections"][mode])
