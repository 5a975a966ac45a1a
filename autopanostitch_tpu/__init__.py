"""autopanostitch_tpu — TPU-native automatic panoramic image stitching.

A brand-new JAX/XLA/Pallas framework with the capabilities of the MATLAB
AutoPanoStitch reference (Brown & Lowe, "Automatic Panoramic Image Stitching
using Invariant Features", IJCV 2007). See SURVEY.md for the layer map.
"""

from autopanostitch_tpu.config import StitchConfig, default_config

__version__ = "0.1.0"

__all__ = ["StitchConfig", "default_config", "__version__"]
