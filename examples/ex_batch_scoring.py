"""Score a batch of test/reference pairs in ONE SPMD program (TPU-native
extension).

The reference scales to many videos by launching one SLURM process per GPU
(pyfvvdp/benchmark_cluster.sh); here `fvvdp.predict_batch` shards a batch of
independent pairs over every device of a `jax.sharding.Mesh` — each chip
scores its local pairs with the single-chip core (Pallas kernels engaged),
so throughput scales linearly with chips and there is no cross-pair
communication.

Runs anywhere: on a TPU pod slice it uses all chips; to try the sharding on
a CPU-only machine, launch with

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python ex_batch_scoring.py

Expected output: per-pair JODs decreasing with noise level, each equal to
what `predict` returns for that pair alone.
"""
import os

import jax
import numpy as np

import ex_utils as utils
import fovvideovdp_tpu as fvdp

MEDIA = os.environ.get("FVVDP_MEDIA", "/root/reference/example_media")

I_ref = fvdp.load_image_as_array(os.path.join(MEDIA, "wavy_facade.png"))
# reduced resolution so the example runs quickly anywhere (incl. CPU meshes)
I_ref = I_ref[::4, ::4].astype(np.float32) / 65535.0

# a batch of distortions: increasing white-noise levels of the same image
sigmas = [0.01, 0.02, 0.04, 0.08]
tests = np.stack([utils.imnoise(I_ref, s) for s in sigmas])
refs = np.broadcast_to(I_ref, tests.shape)

fv = fvdp.fvvdp(display_name="standard_4k", heatmap=None)

print(f"devices: {jax.device_count()} x {jax.devices()[0].platform}")
jods, stats = fv.predict_batch(tests, refs, dim_order="BHWC")
for s, q in zip(sigmas, jods):
    print(f"noise sigma={s:.2f}: {q:.3f} JOD")

# each batched score equals the pair scored alone
q_solo, _ = fv.predict(tests[0], refs[0], dim_order="HWC")
print(f"batched vs solo on pair 0: {jods[0]:.4f} vs {q_solo:.4f}")
