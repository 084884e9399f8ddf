"""Use the metric as a differentiable loss inside a PYTORCH training loop.

The reference implementation is torch-native, so its users plug the metric
straight into torch training; after switching to fovvideovdp_tpu that
workflow is kept by `torch_interop.fvvdp_torch_loss`: a torch callable
whose `backward()` fills `test.grad` with d(loss)/d(test), computed by
`jax.value_and_grad` through the whole jitted pipeline and bridged over
DLPack.  (For JAX-native training see examples/ex_metric_as_loss.py.)

This example restores a noisy image with torch Adam driven purely by the
perceptual loss.  Expected output: loss (10 - JOD) falls monotonically
towards 0 within a few dozen steps.
"""
import os

import numpy as np
import torch

# runnable from a source checkout: add the repo root when not installed
import importlib.util as _ilu
import os as _os
import sys as _sys
if _ilu.find_spec("fovvideovdp_tpu") is None:
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
import fovvideovdp_tpu as fvdp
from fovvideovdp_tpu.torch_interop import fvvdp_torch_loss

MEDIA = os.environ.get("FVVDP_MEDIA", "/root/reference/example_media")
STEPS = int(os.environ.get("FVVDP_OPT_STEPS", "30"))

I_ref = fvdp.load_image_as_array(os.path.join(MEDIA, "wavy_facade.png"))
# quarter resolution so the example runs quickly anywhere
ref = np.asarray(I_ref[::4, ::4], np.float32) / np.float32(
    65535.0 if I_ref.dtype == np.uint16 else 255.0)

rng = np.random.RandomState(0)
noisy = np.clip(ref + rng.randn(*ref.shape).astype(np.float32) * 0.1, 0, 1)

fv = fvdp.fvvdp(display_name="standard_4k")
loss_fn = fvvdp_torch_loss(fv, dim_order="HWC")

x = torch.tensor(noisy, requires_grad=True)
target = torch.tensor(ref)
opt = torch.optim.Adam([x], lr=5e-3)

for step in range(STEPS):
    opt.zero_grad()
    loss = loss_fn(x, target)
    loss.backward()
    opt.step()
    with torch.no_grad():
        x.clamp_(0.0, 1.0)
    if step % 5 == 0 or step == STEPS - 1:
        v = float(loss.detach())
        print(f"step {step:3d}: loss {v:.4f} (Q = {10 - v:.3f} JOD)")
