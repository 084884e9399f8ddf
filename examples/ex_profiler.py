"""Profile the metric with jax.profiler: exports a trace viewable in
Perfetto/TensorBoard (replaces the reference's torch.profiler script)."""
import os
import numpy as np
import jax

# runnable from a source checkout: add the repo root when not installed
import importlib.util as _ilu
import os as _os
import sys as _sys
if _ilu.find_spec("fovvideovdp_tpu") is None:
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
import fovvideovdp_tpu as fvdp

rng = np.random.RandomState(0)
H, W, N, fps = 1080, 1920, 10, 30
V_ref = (rng.rand(H, W, 1, N) * 255).astype(np.uint8)
V_test = np.clip(V_ref.astype(np.int16)
                 + rng.randint(-10, 10, V_ref.shape), 0, 255).astype(np.uint8)

fv = fvdp.fvvdp(display_name="standard_fhd")
# warm up (compile)
fv.predict(V_test, V_ref, dim_order="HWCF", frames_per_second=fps)

trace_dir = os.environ.get("FVVDP_TRACE_DIR", "/tmp/fvvdp_trace")
with jax.profiler.trace(trace_dir):
    Q, _ = fv.predict(V_test, V_ref, dim_order="HWCF", frames_per_second=fps)
print(f"Q = {Q:.3f} JOD; trace written to {trace_dir}")
