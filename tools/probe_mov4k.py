"""Probe: 4K moving-gaze foveated — instrumented with device memory_stats to
find what stays resident after the scan path's OOM fallback.  Run solo."""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))

import numpy as np
import jax

import fovvideovdp_tpu as fv_tpu
from fovvideovdp_tpu.video_source import fvvdp_video_source_array


def mem(tag):
    st = jax.devices()[0].memory_stats() or {}
    inuse = st.get("bytes_in_use", 0) / 2**30
    peak = st.get("peak_bytes_in_use", 0) / 2**30
    lim = st.get("bytes_limit", 0) / 2**30
    print(f"[mem] {tag}: in_use={inuse:.2f} GiB peak={peak:.2f} "
          f"limit={lim:.2f}", flush=True)


W, H, F = 3840, 2160, 60
rng = np.random.RandomState((W * 7919 + H * 31 + F) % (2 ** 31))
ref = rng.randint(0, 255, (H, W, 1, F), dtype=np.uint8)
tst = np.clip(ref.astype(np.int16) + rng.randint(-10, 10, ref.shape),
              0, 255).astype(np.uint8)

fv = fv_tpu.fvvdp(display_name="standard_4k", foveated=True)
vs = fvvdp_video_source_array(tst, ref, 30, dim_order="HWCF",
                              display_photometry=fv.display_photometry)
mem("start")

fix = np.stack([np.linspace(10, W - 10, F), np.linspace(10, H - 10, F)]).T
t0 = time.time()
try:
    Qm, _ = fv.predict_video_source(vs, fixation_point=fix)
    print(f"moving first {time.time()-t0:.1f}s Q={float(Qm):.4f} "
          f"path={fv._exec_path}", flush=True)
except Exception as e:
    mem("after-failure")
    raise
mem("after-first")
best = None
for _ in range(3):
    t0 = time.time()
    Qm, _ = fv.predict_video_source(vs, fixation_point=fix)
    dt = time.time() - t0
    best = dt if best is None else min(best, dt)
print(f"moving warm best {best:.3f}s = {F/best:.1f} fps "
      f"path={fv._exec_path}", flush=True)
mem("end")
print("PROBE OK")
