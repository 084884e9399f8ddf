"""Probe: htc_vive_pro fixed-gaze foveated 60f — the round-4 campaign grid
measured 31 fps where the round-3 judge measured 223.8 fps.  Times the scan
path vs the forced streaming loop and breaks out table generation, to find
where the regression lives.  Run solo on the chip."""
import logging
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))

import numpy as np

import fovvideovdp_tpu as fv_tpu
from fovvideovdp_tpu.video_source import fvvdp_video_source_array

logging.basicConfig(level=logging.DEBUG, format="%(levelname)s %(message)s")
for noisy in ("jax", "jax._src"):
    logging.getLogger(noisy).setLevel(logging.WARNING)

W, H, F = 1440, 1600, 60
rng = np.random.RandomState((W * 7919 + H * 31 + F) % (2 ** 31))
ref = rng.randint(0, 255, (H, W, 1, F), dtype=np.uint8)
tst = np.clip(ref.astype(np.int16) + rng.randint(-10, 10, ref.shape),
              0, 255).astype(np.uint8)

fv = fv_tpu.fvvdp(display_name="htc_vive_pro", foveated=True)
vs = fvvdp_video_source_array(tst, ref, 30, dim_order="HWCF",
                              display_photometry=fv.display_photometry)

core = fv._get_core(W, H)
gaze = (W / 2.0, H / 2.0)
t0 = time.time()
tabs = core._static_fov_tables(gaze)
print(f"[probe] fov table gen (first): {time.time()-t0:.3f}s", flush=True)
t0 = time.time()
tabs = core._static_fov_tables(gaze)
print(f"[probe] fov table gen (cached): {time.time()-t0:.3f}s", flush=True)

t0 = time.time()
Q, _ = fv.predict_video_source(vs)
print(f"[probe] first call {time.time()-t0:.1f}s Q={float(Q):.4f} "
      f"path={fv._exec_path}", flush=True)
for rep in range(4):
    t0 = time.time()
    Q, _ = fv.predict_video_source(vs)
    dt = time.time() - t0
    print(f"[probe] warm#{rep} {dt:.3f}s = {F/dt:.1f} fps "
          f"path={fv._exec_path}", flush=True)

import os
os.environ["FVVDP_DISABLE_SCAN"] = "1"
t0 = time.time()
Q, _ = fv.predict_video_source(vs)
print(f"[probe] stream first {time.time()-t0:.1f}s Q={float(Q):.4f} "
      f"path={fv._exec_path}", flush=True)
for rep in range(3):
    t0 = time.time()
    Q, _ = fv.predict_video_source(vs)
    dt = time.time() - t0
    print(f"[probe] stream warm#{rep} {dt:.3f}s = {F/dt:.1f} fps "
          f"path={fv._exec_path}", flush=True)
print("PROBE OK", flush=True)
