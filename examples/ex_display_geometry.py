"""Sweep viewing distance: artefacts become less visible from farther away."""
import numpy as np

import ex_utils as utils
import fovvideovdp_tpu as fvdp
from fovvideovdp_tpu.display_model import (fvvdp_display_photometry,
                                           fvvdp_display_geometry)

rng = np.random.RandomState(0)
I_ref = (rng.rand(300, 400, 3) * 255).astype(np.uint8)
I_test = utils.imnoise(I_ref, 0.02)

photometry = fvvdp_display_photometry.load("standard_4k")
for dist in [0.5, 1.0, 2.0, 4.0]:
    geometry = fvvdp_display_geometry((3840, 2160), diagonal_size_inches=30,
                                      distance_m=dist)
    fv = fvdp.fvvdp(display_photometry=photometry, display_geometry=geometry)
    Q, _ = fv.predict(I_test, I_ref, dim_order="HWC")
    print(f"Viewing distance {dist:.1f} m ({geometry.get_ppd():.1f} ppd): "
          f"{Q:.3f} JOD")
