"""Probe: 4K foveated fixed-gaze 60-frame video — the config that OOM'd the
chip before per-chunk scan gathers + table-aware budgets.  Run solo."""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))

import numpy as np

import fovvideovdp_tpu as fv_tpu
from fovvideovdp_tpu.video_source import fvvdp_video_source_array

W, H, F = 3840, 2160, 60
rng = np.random.RandomState((W * 7919 + H * 31 + F) % (2 ** 31))
ref = rng.randint(0, 255, (H, W, 1, F), dtype=np.uint8)
tst = np.clip(ref.astype(np.int16) + rng.randint(-10, 10, ref.shape),
              0, 255).astype(np.uint8)

fv = fv_tpu.fvvdp(display_name="standard_4k", foveated=True)
vs = fvvdp_video_source_array(tst, ref, 30, dim_order="HWCF",
                              display_photometry=fv.display_photometry)
t0 = time.time()
Q, _ = fv.predict_video_source(vs)   # central fixed gaze
print(f"first call {time.time()-t0:.1f}s  Q={float(Q):.4f}  "
      f"path={fv._exec_path}", flush=True)
best = None
for _ in range(3):
    t0 = time.time()
    Q, _ = fv.predict_video_source(vs)
    dt = time.time() - t0
    best = dt if best is None else min(best, dt)
print(f"warm best {best:.3f}s = {F/best:.1f} fps  path={fv._exec_path}",
      flush=True)

# moving gaze at 4K too (was never reached in the grid)
fix = np.stack([np.linspace(10, W - 10, F), np.linspace(10, H - 10, F)]).T
t0 = time.time()
Qm, _ = fv.predict_video_source(vs, fixation_point=fix)
print(f"moving first {time.time()-t0:.1f}s Q={float(Qm):.4f} "
      f"path={fv._exec_path}", flush=True)
best = None
for _ in range(3):
    t0 = time.time()
    Qm, _ = fv.predict_video_source(vs, fixation_point=fix)
    dt = time.time() - t0
    best = dt if best is None else min(best, dt)
print(f"moving warm best {best:.3f}s = {F/best:.1f} fps "
      f"path={fv._exec_path}", flush=True)
print("PROBE OK")
