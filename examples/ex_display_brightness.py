"""Sweep display peak luminance: the same distortion is more visible on a
brighter display."""
import numpy as np

import ex_utils as utils
import fovvideovdp_tpu as fvdp
from fovvideovdp_tpu.display_model import (fvvdp_display_photo_eotf,
                                           fvvdp_display_geometry)

rng = np.random.RandomState(0)
I_ref = (rng.rand(300, 400, 3) * 255).astype(np.uint8)
I_test = utils.imnoise(I_ref, 0.02)

geometry = fvvdp_display_geometry.load("standard_4k")
for Y_peak in [1, 10, 100, 1000]:
    photometry = fvvdp_display_photo_eotf(Y_peak, contrast=1000, E_ambient=0)
    fv = fvdp.fvvdp(display_photometry=photometry, display_geometry=geometry)
    Q, _ = fv.predict(I_test, I_ref, dim_order="HWC")
    print(f"Peak luminance {Y_peak:5g} cd/m^2: {Q:.3f} JOD")
