"""The public api facade exposes every reference-named stage."""


def test_api_surface_importable():
    from autopanostitch_tpu import api

    for name in [
        "stitch", "load_images", "extract_features", "match_features",
        "match_images", "recognize_panoramas", "bundle_adjust",
        "bundle_adjust_h", "straighten", "gain_compensate",
        "gain_compensate_planar", "render_panorama", "render_planar",
        "linear_blending", "multiband_blending", "crop_panorama",
        "StitchConfig", "ImageSet", "estimate_focal",
        "initialize_cameras_summary", "draw_annotations",
    ]:
        assert hasattr(api, name), name


def test_initialize_cameras_summary():
    import numpy as np
    import jax.numpy as jnp

    from autopanostitch_tpu import api
    from autopanostitch_tpu.ops import geometry as geo

    f, size = 420.0, (360, 480)
    K = np.array([[f, 0, (size[1] - 1) / 2], [0, f, (size[0] - 1) / 2], [0, 0, 1.0]])
    R_rel = np.asarray(geo.so3_exp(jnp.asarray([0.0, 0.4, 0.0], jnp.float32)))
    H = K @ R_rel @ np.linalg.inv(K)
    pairs = np.array([[0, 1]])
    counts = np.array([[0, 50], [50, 0]])
    out = api.initialize_cameras_summary(pairs, np.stack([H / H[2, 2]]), counts,
                                         np.array([size, size]))
    assert abs(out["f"] - f) / f < 0.05
    assert not out["no_rotation"]
    assert out["R"].shape == (2, 3, 3)
