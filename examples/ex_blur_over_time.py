"""Time-varying distortion: blur that increases over the video."""
import numpy as np

import ex_utils as utils
import fovvideovdp_tpu as fvdp

rng = np.random.RandomState(0)
I_ref = (rng.rand(300, 400, 3) * 255).astype(np.uint8)
N, fps = 30, 30
V_ref = np.repeat(I_ref[..., np.newaxis], N, axis=3)

sigmas = np.linspace(0.01, 4.0, N)
V_blur = utils.imgaussblur(V_ref, sigmas)

fv = fvdp.fvvdp(display_name="standard_4k")
Q, stats = fv.predict(V_blur, V_ref, dim_order="HWCF", frames_per_second=fps)
print(f"Increasing blur: {Q:.3f} JOD")
