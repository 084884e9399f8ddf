"""Score HDR images given in absolute luminance (cd/m^2) on an HDR display."""
import os
import numpy as np

# runnable from a source checkout: add the repo root when not installed
import importlib.util as _ilu
import os as _os
import sys as _sys
if _ilu.find_spec("fovvideovdp_tpu") is None:
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
import fovvideovdp_tpu as fvdp
from fovvideovdp_tpu.display_model import (fvvdp_display_photo_absolute,
                                           fvvdp_display_geometry)

MEDIA = os.environ.get("FVVDP_MEDIA", "/root/reference/example_media")

I_rel = fvdp.load_image_as_array(os.path.join(MEDIA, "nancy_church.hdr"))
# scale relative HDR values into absolute luminance for a 1500 cd/m^2 display
I_ref = I_rel / I_rel.max() * 1500.0

rng = np.random.RandomState(0)
I_test = np.clip(I_ref * (1 + rng.randn(*I_ref.shape) * 0.05), 0.005, 4000)

fv = fvdp.fvvdp(
    display_photometry=fvvdp_display_photo_absolute(L_max=4000),
    display_geometry=fvvdp_display_geometry.load("standard_hdr_linear"))
Q, _ = fv.predict(I_test.astype(np.float32), I_ref.astype(np.float32),
                  dim_order="HWC")
print(f"HDR noise: {Q:.3f} JOD")
