"""Custom display geometry: subclass fvvdp_display_geometry to override the
pixels-per-degree computation (e.g. for a headset with a measured ppd map)."""
import numpy as np
import jax.numpy as jnp

# runnable from a source checkout: add the repo root when not installed
import importlib.util as _ilu
import os as _os
import sys as _sys
if _ilu.find_spec("fovvideovdp_tpu") is None:
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
import fovvideovdp_tpu as fvdp


class custom_display_geometry(fvdp.fvvdp_display_geometry):
    """Example: force 50% resolution magnification everywhere off-axis."""

    def get_resolution_magnification(self, view_dir):
        return jnp.ones(view_dir.shape[-2:], dtype=jnp.float32) * 0.5


rng = np.random.RandomState(0)
I_ref = (rng.rand(200, 300, 3) * 255).astype(np.uint8)
I_test = np.clip(I_ref.astype(np.int16)
                 + rng.randint(-20, 20, I_ref.shape), 0, 255).astype(np.uint8)

geom = custom_display_geometry((1440, 1600), distance_m=3, fov_diagonal=110.0)
fv = fvdp.fvvdp(display_name="htc_vive_pro", display_geometry=geom,
                foveated=True)
Q, _ = fv.predict(I_test, I_ref, dim_order="HWC")
print(f"Quality with custom geometry: {Q:.3f} JOD")
