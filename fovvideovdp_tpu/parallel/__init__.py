"""Multi-chip scaling via jax.sharding meshes (SPMD over ICI).

The reference has no distributed execution at all (SURVEY.md section 2.4);
its multi-GPU story is one independent process per video.  Here scaling is
native: a frame-block is sharded over a ('data', 'space') device mesh —
output frames over 'data', image rows over 'space' — and XLA's SPMD
partitioner inserts the only communication this workload needs (temporal-
window halos on the frame axis, 2-pixel convolution halos on the row axis)
as ICI collectives.
"""
from fovvideovdp_tpu.parallel.sharding import (
    make_mesh,
    make_batch_scorer,
    make_batch_video_scorer,
    shard_video_block_fn,
    shard_video_block_step_fn,
    shard_video_scan_fn,
    shard_image_fn,
)
from fovvideovdp_tpu.parallel.multihost import (
    init_multihost,
    local_batch_to_global,
    local_row_positions,
    replicate_to_hosts,
)

__all__ = ["make_mesh", "make_batch_scorer", "make_batch_video_scorer",
           "shard_video_block_fn", "shard_video_block_step_fn",
           "shard_video_scan_fn", "shard_image_fn", "init_multihost",
           "local_batch_to_global", "local_row_positions",
           "replicate_to_hosts"]
