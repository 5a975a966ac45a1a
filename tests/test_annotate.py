import numpy as np

from autopanostitch_tpu.models import annotate
from autopanostitch_tpu.ops import geometry as geo

import jax.numpy as jnp


def test_warped_boxes_rotational_identity_camera():
    K = np.asarray(geo.build_K(jnp.asarray([200.0]), jnp.asarray([99.5]), jnp.asarray([74.5])))
    R = np.eye(3)[None]
    sizes = np.array([[150, 200]])
    canvas = {"mode": "spherical", "f_pan": 200.0, "x0": -0.6, "y0": -0.5,
              "R_ref": np.eye(3, dtype=np.float32)}
    boxes, centers = annotate.warped_boxes_rotational(canvas, R, K, sizes)
    b = boxes[0]
    assert np.isfinite(b).all()
    # center of the image should land near the canvas point for theta=phi=0
    cx = (0 - canvas["x0"]) * canvas["f_pan"]
    cy = (0 - canvas["y0"]) * canvas["f_pan"]
    assert abs(centers[0][0] - cx) < 8 and abs(centers[0][1] - cy) < 8


def test_draw_annotations_returns_modified_image():
    pano = np.zeros((100, 200, 3), np.uint8)
    boxes = [np.array([[10.0, 10.0], [150.0, 10.0], [150.0, 80.0], [10.0, 80.0]])]
    centers = np.array([[80.0, 45.0]])
    out = annotate.draw_annotations(pano, boxes, centers, crop_rect=(5, 95, 5, 195))
    assert out.shape == pano.shape
    assert out.sum() > 0  # something was drawn


def test_bright_colors():
    c = annotate.bright_colors(5)
    assert c.shape == (5, 3)
    assert (c.max(axis=1) == 255).all()


def test_compose_none_policies():
    """'none-first' keeps the first writer, 'none-last' the last,
    'none-maxangle' the best-facing camera."""
    import jax.numpy as jnp

    from autopanostitch_tpu.models import render as rstage
    from autopanostitch_tpu.ops import geometry as geo

    n = 2
    imgs = np.zeros((n, 64, 96, 3), np.float32)
    imgs[0] += 0.25
    imgs[1] += 0.75
    feathers = np.ones((n, 64, 96), np.float32)
    # camera 1 slightly rotated so overlap exists but angles differ
    R = np.stack([
        np.eye(3, dtype=np.float32),
        np.asarray(geo.so3_exp(jnp.asarray([0.0, 0.12, 0.0], jnp.float32))),
    ])
    K = np.asarray(geo.build_K(jnp.full(n, 90.0), jnp.full(n, 47.5), jnp.full(n, 31.5)))
    canvas = {"mode": "spherical", "f_pan": 90.0, "x0": -0.7, "y0": -0.45,
              "Hc": 64, "Wc": 128, "R_ref": np.eye(3, dtype=np.float32)}
    sel = jnp.arange(n, dtype=jnp.int32)
    ok = jnp.ones(n, bool)
    outs = {}
    for policy in ("none-last", "none-first", "none-maxangle"):
        tile, cov = rstage.render_tile(
            jnp.asarray(imgs), jnp.asarray(feathers), jnp.asarray(R), jnp.asarray(K),
            jnp.ones((n, 3)), sel, ok, jnp.zeros(2), canvas["f_pan"],
            canvas["x0"], canvas["y0"], jnp.asarray(canvas["R_ref"]),
            "spherical", 64, 128, policy, 3, 1.0,
        )
        outs[policy] = np.asarray(tile)
    # overlap region differs between first and last
    diff = (outs["none-first"].astype(int) != outs["none-last"].astype(int)).any(-1)
    assert diff.sum() > 50
    # in the overlap, 'first' shows image0 value (~64), 'last' image1 (~191)
    ys, xs = np.nonzero(diff)
    assert np.median(outs["none-first"][ys, xs, 0]) < 100
    assert np.median(outs["none-last"][ys, xs, 0]) > 150
    # maxangle picks per-pixel the better-facing source: both values present
    ma = outs["none-maxangle"][ys, xs, 0]
    assert (ma < 100).any() and (ma > 150).any()


def test_draw_keypoints_overlay():
    img = np.full((64, 80, 3), 30, np.uint8)
    xy = np.array([[10.0, 12.0], [40.0, 30.0], [70.0, 50.0]])
    mask = np.array([True, True, False])
    out = annotate.draw_keypoints(img, xy, mask, scale=np.array([1.0, 2.0, 3.0]))
    assert out.shape == img.shape
    assert (out != img).any()  # circles drawn
    # masked keypoint area untouched
    assert (out[44:56, 64:76] == 30).all()


def test_draw_matches_side_by_side():
    a = np.full((50, 60, 3), 20, np.uint8)
    b = np.full((40, 70, 3), 40, np.uint8)
    xy_i = np.array([[5.0, 5.0], [30.0, 20.0]])
    xy_j = np.array([[10.0, 8.0], [35.0, 22.0]])
    out = annotate.draw_matches(a, b, xy_i, xy_j, inlier=np.array([True, False]))
    assert out.shape == (50, 130, 3)
    g = (out[..., 1] > 180) & (out[..., 0] < 100)  # green inlier line
    r = (out[..., 0] > 180) & (out[..., 1] < 100)  # red outlier line
    assert g.any() and r.any()


def test_draw_adjacency_graph():
    pairs = np.array([[0, 1], [1, 2], [0, 3]])
    accepted = np.array([True, True, False])
    inl = np.array([40, 10, 0])
    comps = np.array([0, 0, 0, 7])
    out = annotate.draw_adjacency_graph(pairs, accepted, inl, 4, comps)
    assert out.shape == (640, 640, 3)
    grey = (np.abs(out.astype(int) - 120) < 10).all(axis=-1)
    assert grey.any()  # edges drawn


def test_dense_ring_coverage():
    """Regression: contributor selection on a ring denser than one tile's
    span must still cover the whole canvas (tile-level top-C once
    clustered on one side, and seam-straddling cameras once degenerated
    to (-pi, pi) bounds, collapsing 100-view coverage to 0.24)."""
    import synthdata
    from autopanostitch_tpu.config import RenderConfig
    from autopanostitch_tpu.models import render as rstage
    from autopanostitch_tpu.ops import sampling as samp_ops

    n, f = 48, 300.0
    R = np.stack([synthdata.rot_y(i * 2 * np.pi / n).T for i in range(n)]).astype(np.float32)
    K = np.tile(np.diag([f, f, 1.0]).astype(np.float32), (n, 1, 1))
    sizes = np.tile(np.array([120, 160], np.int32), (n, 1))
    rng = np.random.default_rng(0)
    imgs = rng.uniform(size=(n, 120, 160, 3)).astype(np.float32)
    fea = np.asarray(samp_ops.feather_stack(jnp.asarray(sizes), 120, 160))
    canvas = rstage.compute_canvas(R, K, sizes, "spherical", RenderConfig())
    pano, cov = rstage.render_rotational(imgs, fea, R, K, canvas,
                                         blend_mode="linear", sizes=sizes)
    assert float(np.mean(cov)) > 0.9
    colcov = np.asarray(cov).mean(axis=0)
    assert float(np.quantile(colcov, 0.05)) > 0.5  # no dead columns
