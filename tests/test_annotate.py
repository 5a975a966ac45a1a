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
