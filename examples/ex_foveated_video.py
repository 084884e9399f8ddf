"""Foveated metric with a gaze position moving across the frame."""
import os
import numpy as np

import ex_utils as utils
import fovvideovdp_tpu as fvdp

MEDIA = os.environ.get("FVVDP_MEDIA", "/root/reference/example_media")

I_ref = fvdp.load_image_as_array(os.path.join(MEDIA, "wavy_facade.png"))
N, fps = 60, 30
V_ref = np.repeat(I_ref[..., np.newaxis], N, axis=3)
V_test = utils.imnoise(V_ref, 0.02)

# gaze moves from the top-left to the bottom-right corner
gaze = np.stack((np.linspace(0, V_ref.shape[1] - 1, N),
                 np.linspace(0, V_ref.shape[0] - 1, N))).T

fv = fvdp.fvvdp(display_name="htc_vive_pro", foveated=True)
Q, _ = fv.predict(V_test, V_ref, dim_order="HWCF", frames_per_second=fps,
                  fixation_point=gaze)
print(f"Quality for dynamic noise (moving gaze): {Q:.3f} JOD")
