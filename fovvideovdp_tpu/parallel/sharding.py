"""Device meshes and sharded scoring functions.

Sharding layout
---------------
* 'data'  — the frame axis of a video block (embarrassingly parallel per
  output frame after temporal filtering; the only cross-device dependency is
  the filter_len-1 frame halo of the temporal convolution, which XLA lowers
  to neighbour collective-permutes over ICI).
* 'space' — the image row axis (for very large single frames); separable
  5-tap pyramid convolutions need 2-row halos per level, again auto-lowered.

Both are expressed as NamedSharding constraints on a jit of the SAME pure
core functions used single-chip — no separate distributed code path.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              data_parallel: Optional[int] = None) -> Mesh:
    """Create a ('data', 'space') mesh over the given devices.

    By default all of `jax.devices()` go to the 'data' axis; pass
    ``data_parallel`` to split the device count between frame ('data') and
    row ('space') sharding.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data_parallel is None:
        data_parallel = n
    if n % data_parallel != 0:
        raise ValueError(f"{n} devices not divisible by data_parallel={data_parallel}")
    space = n // data_parallel
    dev_grid = np.asarray(devices).reshape(data_parallel, space)
    return Mesh(dev_grid, ("data", "space"))


def shard_video_block_fn(core, filt: np.ndarray, mesh: Mesh):
    """Sharded version of MetricCore.video_block_fn.

    Inputs (padded_t, padded_r): (B + fl - 1, H, W) — frame axis over 'data',
    rows over 'space'.  Q output is tiny and replicated; heatmaps stay
    sharded like the input frames.
    """
    import jax.numpy as jnp
    from fovvideovdp_tpu.ops import temporal as temporal_ops

    F_filt = jnp.asarray(filt)
    # The padded sequence length (B + fl - 1) rarely divides the device count,
    # so inputs are sharded on rows only; the (B, 4, H, W) temporal responses
    # are then constrained over ('data', 'space') and XLA reshards once.
    seq_sharding = NamedSharding(mesh, P(None, "space", None))
    r_sharding = NamedSharding(mesh, P("data", None, "space", None))
    gaze_sharding = NamedSharding(mesh, P("data", None))
    q_sharding = NamedSharding(mesh, P(None, None, "data"))

    def fn(padded_t, padded_r, *maybe_gaze):
        Rt = temporal_ops.apply_temporal_filters(padded_t, F_filt)
        Rr = temporal_ops.apply_temporal_filters(padded_r, F_filt)
        R = jnp.stack([Rt[:, 0], Rr[:, 0], Rt[:, 1], Rr[:, 1]], axis=1)
        R = jax.lax.with_sharding_constraint(R, r_sharding)
        gaze = maybe_gaze[0] if core.foveated else None
        Q, heat = core.score_frames(R, gaze, temp_ch=2)
        if heat is None:
            return Q, None
        return Q, heat

    in_shardings = (seq_sharding, seq_sharding)
    if core.foveated:
        in_shardings = in_shardings + (gaze_sharding,)
    heat_sharding = NamedSharding(mesh, P("data", None, "space", None))
    out_shardings = (q_sharding, heat_sharding if core.do_heatmap else None)
    return jax.jit(fn, in_shardings=in_shardings, out_shardings=out_shardings)


def make_batch_scorer(core, mesh: Mesh, pool_params: dict):
    """Batch-of-image-pairs scorer sharded over the 'data' mesh axis.

    The reference farms independent pairs out as one SLURM process per GPU
    (pyfvvdp/benchmark_cluster.sh); here a batch of pairs is one SPMD
    program: inputs (N, H, W) luminance, N sharded over 'data', each pair
    scored independently and pooled to its own JOD.

    Returns a jitted fn (tests, refs) -> (N,) JOD scores.
    """
    import jax.numpy as jnp

    from fovvideovdp_tpu.ops import masking as mask_ops

    batch_sharding = NamedSharding(mesh, P("data", None, None))
    out_sharding = NamedSharding(mesh, P("data"))

    def score_one(T, Rf):
        R = jnp.stack([T, Rf], axis=0)[None]
        Q_per_ch, _ = core.score_frames(R, None, temp_ch=1)
        return mask_ops.pool_to_jod(
            Q_per_ch, pool_params["w_transient"], pool_params["beta_sch"],
            pool_params["beta_tch"], pool_params["beta_t"],
            pool_params["jod_a"], pool_params["log_jod_exp"])

    def fn(tests, refs):
        return jax.vmap(score_one)(tests, refs)

    return jax.jit(fn, in_shardings=(batch_sharding, batch_sharding),
                   out_shardings=out_sharding)


def shard_image_fn(core, mesh: Mesh):
    """Sharded single-image scorer: rows over 'space' (a lone image has no
    frame axis to shard)."""
    import jax.numpy as jnp

    img_sharding = NamedSharding(mesh, P("space", None))

    def fn(T, Rf):
        R = jnp.stack([T, Rf], axis=0)[None]
        return core.score_frames(R, None, temp_ch=1)

    return jax.jit(fn, in_shardings=(img_sharding, img_sharding))
