"""Use the metric as a differentiable training loss (TPU-native extension).

The whole pipeline — display photometry, temporal channels, contrast
pyramid, CSF lookup, masking, pooling — is pure JAX, so `jax.grad` flows
through it end-to-end (`fvvdp.loss` = 10 - Q_JOD).  This example restores a
degraded image by gradient descent directly on the perceptual loss: start
from a noisy copy of a reference and optimise the pixels until the
difference is (nearly) imperceptible.

The reference implementation reaches trainability through torch gradient
checkpointing (pyfvvdp/fvvdp.py:302-304); here `use_checkpoints=True` on the
constructor applies `jax.checkpoint` around the spatial core for the same
memory/compute trade on long clips.

Expected output: the JOD climbs from ~9.5 (visible noise) towards 10
(imperceptible) within a few dozen steps.
"""
import os
import numpy as np
import jax
import jax.numpy as jnp

import ex_utils as utils
import fovvideovdp_tpu as fvdp

MEDIA = os.environ.get("FVVDP_MEDIA", "/root/reference/example_media")
STEPS = int(os.environ.get("FVVDP_OPT_STEPS", "40"))

I_ref = fvdp.load_image_as_array(os.path.join(MEDIA, "wavy_facade.png"))
# work at quarter resolution so the example runs quickly anywhere
I_ref = I_ref[::2, ::2].astype(np.float32) / 65535.0

fv = fvdp.fvvdp(display_name="standard_4k")

ref = jnp.asarray(I_ref)
test0 = jnp.asarray(utils.imnoise(I_ref, np.sqrt(0.003)))


@jax.jit
def loss_fn(test):
    return fv.loss(jnp.clip(test, 0.0, 1.0), ref, dim_order="HWC")


grad_fn = jax.jit(jax.grad(loss_fn))

test = test0
lr = 0.5
print(f"start: {10.0 - float(loss_fn(test)):.3f} JOD")
for it in range(STEPS):
    test = jnp.clip(test - lr * grad_fn(test), 0.0, 1.0)
    if (it + 1) % 10 == 0:
        print(f"step {it + 1:3d}: {10.0 - float(loss_fn(test)):.3f} JOD")
print(f"final: {10.0 - float(loss_fn(test)):.3f} JOD "
      f"(started at {10.0 - float(loss_fn(test0)):.3f})")
