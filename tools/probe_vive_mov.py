"""Probe: htc_vive_pro moving-gaze foveated 60f — which exec path does it
take (scan vs streaming), and what does each cost?  The r4 grid measured
170 fps moving vs 238 fps fixed; if the moving case is margin-gated off
the scan path, the gap is per-block dispatch latency, not kernel time.
Run solo on the chip."""
import logging
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))

import numpy as np

import fovvideovdp_tpu as fv_tpu
from fovvideovdp_tpu.video_source import fvvdp_video_source_array

logging.basicConfig(level=logging.INFO, format="%(levelname)s %(message)s")
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
mov = np.stack([np.linspace(10, W - 10, F),
                np.linspace(10, H - 10, F)]).T

for tag, fix in (("moving", mov), ("fixed", None)):
    kw = {"fixation_point": fix} if fix is not None else {}
    t0 = time.time()
    Q, _ = fv.predict_video_source(vs, **kw)
    print(f"{tag} first {time.time()-t0:.1f}s Q={float(Q):.4f} "
          f"path={fv._exec_path}", flush=True)
    best = None
    for _ in range(3):
        t0 = time.time()
        Q, _ = fv.predict_video_source(vs, **kw)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{tag} warm best {best:.3f}s = {F/best:.1f} fps "
          f"path={fv._exec_path}", flush=True)
print("PROBE OK")
