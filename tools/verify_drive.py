"""End-to-end verify drive: README golden parity on the real chip, plus a
moving-gaze foveated drive through the new in-kernel trilinear scorer
(ops/pallas/mov_score.py) checked against the jnp trilinear path."""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))

import numpy as np
import fovvideovdp_tpu as fv_tpu
from scipy.ndimage import gaussian_filter

I = fv_tpu.load_image_as_array(
    '/root/reference/example_media/wavy_facade.png')
assert I.dtype == np.uint16 and I.shape == (683, 1024, 3), (I.dtype, I.shape)
rng = np.random.RandomState(42)
noise = (np.clip(I / 65535.0 + rng.randn(*I.shape) * np.sqrt(0.003), 0, 1)
         * 65535).astype(np.uint16)
blur = np.stack([gaussian_filter(I[:, :, c].astype(np.float32), 2,
                                 mode='nearest', truncate=2.0)
                 for c in range(3)], -1).astype(np.uint16)
fv = fv_tpu.fvvdp(display_name='standard_4k', heatmap='threshold')
q_noise = float(fv.predict(noise, I, dim_order='HWC')[0])
q_blur = float(fv.predict(blur, I, dim_order='HWC')[0])
print(f"noise {q_noise:.4f} (README 9.537)  blur {q_blur:.4f} (README 8.693)")
assert abs(q_noise - 9.537) <= 0.01, q_noise
assert abs(q_blur - 8.693) <= 0.01, q_blur

# moving-gaze foveated video: fused kernel path vs jnp trilinear
from fovvideovdp_tpu.ops import pallas as cfg
rng = np.random.RandomState(7)
F = 12
ref_v = rng.randint(0, 255, (360, 640, 3, F), dtype=np.uint8)
tst_v = np.clip(ref_v.astype(np.int16)
                + rng.randint(-20, 20, ref_v.shape), 0, 255).astype(np.uint8)
gaze = np.stack([np.linspace(40, 600, F), np.linspace(30, 330, F)], axis=1)
fv_fov = fv_tpu.fvvdp(display_name='htc_vive_pro', foveated=True)
q_mov = float(fv_fov.predict(tst_v, ref_v, dim_order='HWCF',
                             frames_per_second=30,
                             fixation_point=gaze)[0])
with cfg.forced(False):
    fv_fov2 = fv_tpu.fvvdp(display_name='htc_vive_pro', foveated=True)
    q_mov_jnp = float(fv_fov2.predict(tst_v, ref_v, dim_order='HWCF',
                                      frames_per_second=30,
                                      fixation_point=gaze)[0])
print(f"moving-gaze fused {q_mov:.4f} vs jnp {q_mov_jnp:.4f}")
assert abs(q_mov - q_mov_jnp) <= 0.01, (q_mov, q_mov_jnp)
print("VERIFY OK")
