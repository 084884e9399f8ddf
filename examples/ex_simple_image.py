"""Score a noisy and a blurry version of an image on a standard 4K display.

Expected output (README goldens of the published metric):
  noise: ~9.54 JOD, blur: ~8.69 JOD.
"""
import os
import numpy as np

import ex_utils as utils
import fovvideovdp_tpu as fvdp

MEDIA = os.environ.get("FVVDP_MEDIA", "/root/reference/example_media")

I_ref = fvdp.load_image_as_array(os.path.join(MEDIA, "wavy_facade.png"))

I_test_noise = utils.imnoise(I_ref, np.sqrt(0.003))
I_test_blur = utils.imgaussblur(I_ref, 2)

fv = fvdp.fvvdp(display_name="standard_4k", heatmap="threshold")

Q_JOD_noise, stats_noise = fv.predict(I_test_noise, I_ref, dim_order="HWC")
print(f"Noise - Quality: {Q_JOD_noise:.3f} JOD")

Q_JOD_blur, stats_blur = fv.predict(I_test_blur, I_ref, dim_order="HWC")
print(f"Blur - Quality: {Q_JOD_blur:.3f} JOD")
