"""On-hardware verification drive: README golden parity + changed-path probes.

Run solo on the real TPU (no concurrent python processes).
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))

import numpy as np
from scipy.ndimage import gaussian_filter

import fovvideovdp_tpu as fv_tpu

failures = []


def check(name, got, want, tol):
    d = abs(float(got) - want)
    status = "ok" if d <= tol else "FAIL"
    print(f"{name}: {float(got):.4f} vs {want} (|d|={d:.4f}, tol {tol}) {status}",
          flush=True)
    if d > tol:
        failures.append(name)


I = fv_tpu.load_image_as_array('/root/reference/example_media/wavy_facade.png')
assert I.dtype == np.uint16 and I.shape == (683, 1024, 3), (I.dtype, I.shape)
rng = np.random.RandomState(42)
noise = (np.clip(I / 65535.0 + rng.randn(*I.shape) * np.sqrt(0.003), 0, 1)
         * 65535).astype(np.uint16)
blur = np.stack([gaussian_filter(I[:, :, c].astype(np.float32), 2,
                                 mode='nearest', truncate=2.0)
                 for c in range(3)], -1).astype(np.uint16)

fv = fv_tpu.fvvdp(display_name='standard_4k', heatmap='threshold')
t0 = time.time()
Qn, statsn = fv.predict(noise, I, dim_order='HWC')
check("wavy noise", Qn, 9.537, 0.01)
Qb, _ = fv.predict(blur, I, dim_order='HWC')
check("wavy blur", Qb, 8.693, 0.01)
assert statsn is not None and "heatmap" in statsn
print(f"image goldens drove in {time.time()-t0:.1f}s", flush=True)

# heatmap VIDEO path — exercises the new quarter block budget
rngv = np.random.RandomState(1)
H, W, F = 1080, 1920, 24
refv = rngv.randint(0, 255, (H, W, 1, F), dtype=np.uint8)
tstv = np.clip(refv.astype(np.int16)
               + rngv.randint(-12, 12, refv.shape), 0, 255).astype(np.uint8)
fvh = fv_tpu.fvvdp(display_name='standard_4k', heatmap='threshold')
t0 = time.time()
Qv, sv = fvh.predict(tstv, refv, dim_order='HWCF', frames_per_second=30)
hm = sv["heatmap"]
print(f"heatmap video 1080p f{F}: Q={float(Qv):.4f}, heatmap {hm.shape} "
      f"{hm.dtype}, {time.time()-t0:.1f}s", flush=True)
assert hm.shape[-3:] == (F, H, W), hm.shape  # (B, C, F, H, W)

# plain video with the same content must agree (heatmap must not perturb Q)
fvp = fv_tpu.fvvdp(display_name='standard_4k')
Qp, _ = fvp.predict(tstv, refv, dim_order='HWCF', frames_per_second=30)
check("heatmap-vs-plain video Q", Qv, float(Qp), 1e-3)

# foveated moving-gaze (fused in-kernel trilinear CSF) on hardware
fvf = fv_tpu.fvvdp(display_name='htc_vive_pro', foveated=True)
Hf, Wf, Ff = 800, 720, 16
rf = rngv.randint(0, 255, (Hf, Wf, 1, Ff), dtype=np.uint8)
tf = np.clip(rf.astype(np.int16)
             + rngv.randint(-15, 15, rf.shape), 0, 255).astype(np.uint8)
gaze = np.stack([np.linspace(100, Wf - 100, Ff),
                 np.linspace(100, Hf - 100, Ff)], -1).astype(np.float32)
t0 = time.time()
Qm, _ = fvf.predict(tf, rf, dim_order='HWCF', frames_per_second=30,
                    fixation_point=gaze)
print(f"foveated moving-gaze {Wf}x{Hf} f{Ff}: Q={float(Qm):.4f} "
      f"({time.time()-t0:.1f}s)", flush=True)
Qm2, _ = fvf.predict(tf, rf, dim_order='HWCF', frames_per_second=30,
                     fixation_point=gaze)
check("moving-gaze repeat determinism", Qm2, float(Qm), 1e-6)

from fovvideovdp_tpu.utils import platform_info
print(f"platform: {platform_info()}", flush=True)

if failures:
    print("VERIFY FAILED: " + ", ".join(failures), file=sys.stderr)
    sys.exit(1)
print("VERIFY OK", flush=True)
