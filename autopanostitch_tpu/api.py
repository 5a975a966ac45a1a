"""Stable public API with reference-stage naming.

One import site exposing each pipeline stage under the name a user of the
MATLAB reference would look for (SURVEY.md section 7 API surface). These
are thin aliases — the implementations live in models/ and ops/.

>>> from autopanostitch_tpu import api
>>> iset = api.load_images(["a.jpg", "b.jpg"])
>>> result = api.stitch(iset)
"""

from __future__ import annotations

# driver / config
from autopanostitch_tpu.config import StitchConfig, default_config  # noqa: F401
from autopanostitch_tpu.models.pipeline import (  # noqa: F401
    stitch,
    stitch_component,
    match_features,
    select_candidate_pairs,
    verify_matches as match_images,
    connected_components as recognize_panoramas,
    second_pass_matching,
    StitchResult,
    MatchGraph,
)

# stages under reference-style names
from autopanostitch_tpu.utils.image_io import (  # noqa: F401
    load_image_set as load_images,
    load_image,
    list_dataset,
    save_image,
    resize_fit,
    resize_pad,
    resize_fillcrop,
    ImageSet,
)
from autopanostitch_tpu.models.features import extract_features  # noqa: F401
from autopanostitch_tpu.models.bundle import (  # noqa: F401
    run_bundle_adjustment as bundle_adjust,
    estimate_focal,
    initialize_cameras_summary,
    Cameras,
)
from autopanostitch_tpu.models.bundle_h import (  # noqa: F401
    run_bundle_adjustment_h as bundle_adjust_h,
)
from autopanostitch_tpu.models.straighten import straighten_rotations as straighten  # noqa: F401
from autopanostitch_tpu.models.gain import (  # noqa: F401
    compute_gains_rotational as gain_compensate,
    compute_gains_planar as gain_compensate_planar,
)
from autopanostitch_tpu.models.render import (  # noqa: F401
    compute_canvas,
    render_rotational as render_panorama,
)
from autopanostitch_tpu.models.planar import (  # noqa: F401
    render_planar,
    composite_from_abs,
    chain_to_anchor,
)
from autopanostitch_tpu.ops.blend import (  # noqa: F401
    linear_blend as linear_blending,
    multiband_blend as multiband_blending,
)
from autopanostitch_tpu.models.crop import (  # noqa: F401
    crop_panorama,
    crop_bbox,
    largest_inscribed_rect,
    mask_from_color,
)
from autopanostitch_tpu.models.annotate import (  # noqa: F401
    warped_boxes_rotational,
    warped_boxes_planar,
    draw_annotations,
    draw_keypoints,
    draw_matches,
    draw_adjacency_graph,
)
from autopanostitch_tpu.parallel.pipeline import (  # noqa: F401
    stitch_multichip,
)
