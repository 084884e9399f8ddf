"""Score a video defined as a numpy array (dynamic vs static noise)."""
import os
import numpy as np

import ex_utils as utils
import fovvideovdp_tpu as fvdp

MEDIA = os.environ.get("FVVDP_MEDIA", "/root/reference/example_media")

I_ref = fvdp.load_image_as_array(os.path.join(MEDIA, "tree.jpg"))
N = 60
fps = 30
V_ref = np.repeat(I_ref[..., np.newaxis], N, axis=3)

V_dynamic = utils.imnoise(V_ref, 0.02)
V_static = utils.imnoise(V_ref, 0.02, static=True)

fv = fvdp.fvvdp(display_name="standard_4k")

Q, _ = fv.predict(V_dynamic, V_ref, dim_order="HWCF", frames_per_second=fps)
print(f"Dynamic noise: {Q:.3f} JOD")
Q, _ = fv.predict(V_static, V_ref, dim_order="HWCF", frames_per_second=fps)
print(f"Static noise:  {Q:.3f} JOD")
