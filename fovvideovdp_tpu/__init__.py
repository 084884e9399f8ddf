"""fovvideovdp_tpu — TPU-native (JAX/XLA/Pallas) full-reference foveated
video/image quality metric with the capabilities of FovVideoVDP.

Public API mirrors the reference package (pyfvvdp/__init__.py) so existing
user code ports with an import change.
"""

import os as _os

# Persistent XLA compilation cache: metric programs are large (tens of
# seconds to compile) but perfectly cacheable; this makes warm-up across
# processes near-instant. Opt out by setting JAX_COMPILATION_CACHE_DIR="".
if "JAX_COMPILATION_CACHE_DIR" not in _os.environ:
    import jax as _jax
    try:
        if _jax.config.jax_compilation_cache_dir is None:
            _jax.config.update(
                "jax_compilation_cache_dir",
                _os.path.expanduser("~/.cache/jax"))
            _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

if _os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    # Some environments force-register an accelerator plugin at interpreter
    # start, overriding the JAX_PLATFORMS read from the environment; honour
    # the user's explicit CPU request by re-pinning the config key.  (This
    # must NOT touch jax.devices() — importing the package before
    # jax.distributed.initialize() would otherwise lock in a single-process
    # backend.)
    import jax as _jax
    try:
        _jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

from fovvideovdp_tpu.fvvdp import fvvdp
from fovvideovdp_tpu.display_model import (
    fvvdp_display_photometry,
    fvvdp_display_photo_eotf,
    fvvdp_display_photo_absolute,
    fvvdp_display_photo_gog,
    fvvdp_display_geometry,
)
from fovvideovdp_tpu.video_source import (
    fvvdp_video_source,
    fvvdp_video_source_array,
    fvvdp_video_source_packed_array,
)
from fovvideovdp_tpu.pupsnr import pu_psnr
from fovvideovdp_tpu.io.images import load_image_as_array

__version__ = "0.1.0"

__all__ = [
    "fvvdp",
    "pu_psnr",
    "fvvdp_display_photometry",
    "fvvdp_display_photo_eotf",
    "fvvdp_display_photo_absolute",
    "fvvdp_display_photo_gog",
    "fvvdp_display_geometry",
    "fvvdp_video_source",
    "fvvdp_video_source_array",
    "fvvdp_video_source_packed_array",
    "load_image_as_array",
]
