"""Device meshes and sharded scoring functions.

Sharding layout
---------------
The metric is embarrassingly parallel over output frames (after temporal
filtering) and over independent test/reference pairs, so the primary scale-out
axis shards *frames x pairs* over every device of the mesh.  The spatial core
(pyramid, CSF, masking — including the Pallas kernels) runs inside
``jax.shard_map``: each device executes the SAME single-chip program on its
local block of frames, so ``pl.pallas_call`` never meets the GSPMD
partitioner — the sharded path runs exactly the kernels the single-chip path
runs.  The only cross-device communication is the temporal-filter resharding
(XLA collective-permutes the filter_len-1 frame halo over ICI) and the tiny
Q gathers.

For one very large single frame there is additionally a row-sharded image
scorer ('space' axis): there the pyramid's 2-row convolution halos are left
to XLA's SPMD partitioner (jit + NamedSharding over the jnp path — Pallas is
explicitly disabled for that trace; custom kernels without sharding rules
must not be partitioned blindly).
"""
from __future__ import annotations

import math
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


def _mesh_size(mesh: Mesh) -> int:
    return int(math.prod(mesh.devices.shape))


def _frame_axes(mesh: Mesh):
    """All mesh axes as one logical frame-parallel axis."""
    return tuple(mesh.axis_names)


def shard_video_block_fn(core, filt: np.ndarray, mesh: Mesh):
    """Sharded version of MetricCore.video_block_fn.

    Inputs (padded_t, padded_r): (B + fl - 1, H, W) with B divisible by the
    device count.  The temporal filtering runs under jit (XLA reshards the
    fl-1 frame halos over ICI); the spatial core runs in shard_map with B/n
    frames per device — Pallas kernels engage per shard exactly as on a
    single chip.  Q output is gathered; heatmaps stay sharded on the frame
    axis.
    """
    import jax.numpy as jnp
    from fovvideovdp_tpu.ops import temporal as temporal_ops

    F_filt = jnp.asarray(filt)
    fl = filt.shape[1]
    n_dev = _mesh_size(mesh)
    axes = _frame_axes(mesh)

    r_spec = P(axes, None, None, None)
    gaze_spec = P(axes, None)
    q_spec = P(None, None, axes)

    in_specs = (r_spec,) + ((gaze_spec,) if core.foveated else ())
    out_specs = (q_spec,) + ((r_spec,) if core.do_heatmap else ())

    def score_shard(R, *maybe_gaze):
        gaze = maybe_gaze[0] if core.foveated else None
        Q, heat = core.score_frames(R, gaze, temp_ch=2)
        return (Q,) + ((heat,) if core.do_heatmap else ())

    sharded_score = jax.shard_map(score_shard, mesh=mesh, in_specs=in_specs,
                                  out_specs=out_specs, check_vma=False)

    def fn(padded_t, padded_r, *maybe_gaze):
        B = padded_t.shape[0] - fl + 1
        if B % n_dev != 0:
            raise ValueError(
                f"block size {B} not divisible by {n_dev} devices; pass "
                f"block_frames as a multiple of the device count")
        Rt = temporal_ops.apply_temporal_filters(padded_t, F_filt)
        Rr = temporal_ops.apply_temporal_filters(padded_r, F_filt)
        R = jnp.stack([Rt[:, 0], Rr[:, 0], Rt[:, 1], Rr[:, 1]], axis=1)
        R = jax.lax.with_sharding_constraint(R, NamedSharding(mesh, r_spec))
        outs = sharded_score(R, *maybe_gaze)
        Q = outs[0]
        heat = outs[1] if core.do_heatmap else None
        return Q, heat

    gaze_shard = (NamedSharding(mesh, gaze_spec),) if core.foveated else ()
    seq_sharding = NamedSharding(mesh, P(None, "space", None))
    return jax.jit(fn, in_shardings=(seq_sharding, seq_sharding) + gaze_shard)


def _sharded_video_step(core, filt_np: np.ndarray, mesh: Mesh,
                        use_tabs: bool, gaze_in_sig: bool,
                        log_contrast: bool):
    """Raw (unjitted) sharded streaming step shared by
    :func:`shard_video_block_step_fn` (one jitted step per host dispatch)
    and :func:`shard_video_scan_fn` (the whole chunk schedule rolled into
    one ``lax.scan``) — the multi-chip analog of MetricCore._video_step.

    The temporal filters run as plain jnp ON PURPOSE: under jit GSPMD
    partitions them over the frame axis (the Pallas temporal kernel has no
    SPMD partitioning rule and would force replication of the whole global
    block on a real mesh); the spatial core (pyramid/CSF/masking, Pallas
    kernels included) runs in ``jax.shard_map`` with B/n_dev frames per
    device — exactly the single-chip program per shard.
    """
    import jax.numpy as jnp

    from fovvideovdp_tpu.ops import temporal as temporal_ops

    fl = filt_np.shape[1]
    axes = _frame_axes(mesh)
    r_spec = P(axes, None, None, None)
    extra_specs = (P(axes, None),) if gaze_in_sig else \
        ((P(),) if use_tabs else ())

    def score_shard(R, *extra):
        if use_tabs:
            Q, heat = core.score_frames(R, None, temp_ch=2, fov_tables=extra[0])
        else:
            gaze = extra[0] if gaze_in_sig else None
            Q, heat = core.score_frames(R, gaze, temp_ch=2)
        return (Q,) + ((heat,) if core.do_heatmap else ())

    sharded = jax.shard_map(
        score_shard, mesh=mesh, in_specs=(r_spec,) + extra_specs,
        out_specs=(P(None, None, axes),) + ((r_spec,) if core.do_heatmap else ()),
        check_vma=False)

    F_filt_arr = jnp.asarray(filt_np)

    def step(carry_t, carry_r, new_t, new_r, *extra):
        if log_contrast:
            new_t = jnp.log10(jnp.clip(new_t, 1e-6, None))
            new_r = jnp.log10(jnp.clip(new_r, 1e-6, None))
        B = new_t.shape[0]
        padded_t = jnp.concatenate([carry_t, new_t], axis=0)
        padded_r = jnp.concatenate([carry_r, new_r], axis=0)
        Rt = temporal_ops.apply_temporal_filters(padded_t, F_filt_arr)
        Rr = temporal_ops.apply_temporal_filters(padded_r, F_filt_arr)
        R = jnp.stack([Rt[:, 0], Rr[:, 0], Rt[:, 1], Rr[:, 1]], axis=1)
        R = jax.lax.with_sharding_constraint(R, NamedSharding(mesh, r_spec))
        outs = sharded(R, *extra)
        Q = outs[0]
        heat = outs[1] if core.do_heatmap else None
        if fl - 1 <= 0:
            c_t, c_r = new_t[:0], new_r[:0]
        elif fl - 1 <= B:
            c_t, c_r = new_t[-(fl - 1):], new_r[-(fl - 1):]
        else:
            c_t, c_r = padded_t[-(fl - 1):], padded_r[-(fl - 1):]
        return Q, heat, c_t, c_r

    return step


def shard_video_block_step_fn(core, filt: np.ndarray, mesh: Mesh,
                              static_gaze=None, log_contrast: bool = False,
                              defer_tables: bool = False):
    """Sharded streaming step: the multi-chip analog of
    MetricCore.video_block_step_fn (same carry-in/carry-out contract), so
    ``fvvdp.predict`` can stream ONE long video over a whole mesh.

    fn(carry_t, carry_r, new_t (B, H, W), new_r [, gaze (B, 2)]) ->
    (Q_per_ch, heatmap | None, carry_t', carry_r')

    The temporal filters run under plain jit — XLA reshards the fl-1 frame
    halos between neighbouring devices over ICI — and the spatial core runs
    in ``jax.shard_map`` with B/n_dev frames per device (see
    :func:`_sharded_video_step`).  B must be divisible by the mesh size
    (``fvvdp`` rounds its block size up and pads tail blocks).  With
    ``static_gaze`` the foveated CSF tables are computed once and
    replicated; a moving gaze shards with its frames.  ``defer_tables=True``
    returns fn(..., tables) binding the CSF tables per CALL, so a cached
    step serves every fixation point without recompiling.
    """
    tables = core._static_fov_tables(static_gaze)
    use_tabs = defer_tables or tables is not None
    filt_np = np.asarray(filt, dtype=np.float32)
    gaze_in_sig = core.foveated and not use_tabs
    n_dev = _mesh_size(mesh)
    axes = _frame_axes(mesh)

    step = _sharded_video_step(core, filt_np, mesh, use_tabs, gaze_in_sig,
                               log_contrast)

    repl = NamedSharding(mesh, P())
    frame_shard = NamedSharding(mesh, P(axes, None, None))
    base_shardings = (repl, repl, frame_shard, frame_shard)
    state = {}  # the tables' jit is built on first call (needs the pytree)

    def fn(carry_t, carry_r, new_t, new_r, *extra):
        if new_t.shape[0] % n_dev != 0:
            raise ValueError(
                f"block size {new_t.shape[0]} not divisible by {n_dev} "
                f"devices; pass block_frames as a multiple of the device count")
        if use_tabs:
            tabs = extra[0] if extra else tables
            if "jit" not in state:
                state["jit"] = jax.jit(step, in_shardings=base_shardings
                                       + (jax.tree.map(lambda _: repl, tabs),))
            return state["jit"](carry_t, carry_r, new_t, new_r, tabs)
        if "jit" not in state:
            gaze_sh = (NamedSharding(mesh, P(axes, None)),) if gaze_in_sig \
                else ()
            state["jit"] = jax.jit(step, in_shardings=base_shardings + gaze_sh)
        return state["jit"](carry_t, carry_r, new_t, new_r, *extra)

    return fn


def shard_video_scan_fn(core, filt: np.ndarray, mesh: Mesh,
                        block_frames: int, chunk_blocks: int,
                        static_gaze=None, log_contrast: bool = False,
                        defer_tables: bool = False):
    """Sharded chunked-scan scorer: ``chunk_blocks`` blocks scored in ONE
    dispatch over the whole mesh — the multi-chip analog of
    MetricCore.video_scan_fn (same carry/chunk contract).

    ``lax.scan`` runs over blocks; within each block the B frames shard over
    every device of the mesh and the scan body IS the sharded streaming step
    (:func:`_sharded_video_step`), so the numerics match the sharded
    streaming path exactly.  What the scan removes is the per-block host
    dispatch round-trip — on an 8-chip mesh a whole video scores in a
    handful of dispatches instead of one per block.  The reference has no
    analog (SURVEY.md section 2.4: its only concurrency is one process per
    GPU); this is the TPU-first design completing itself.

    fn(carry_t, carry_r, chunk_t (chunk_blocks, B, H, W), chunk_r
       [, gaze (chunk_blocks, B, 2)][, tables]) ->
    (Q_per_ch (n_bands, 2, chunk_blocks*B), carry_t', carry_r')

    Chunks arrive pre-blocked (axis 0 = blocks, axis 1 = frames) so the
    frame axis shards unambiguously; ``fvvdp._try_scan_video`` reshapes its
    gathered (chunk_blocks*B, H, W) luminance before the call.  Heatmaps
    keep the streaming path (their per-block readback is the point of
    streaming).  B must be divisible by the mesh size.
    """
    import jax.numpy as jnp

    if core.do_heatmap:
        raise RuntimeError("the scan path scores without heatmaps; "
                           "use the streaming path")
    tables = core._static_fov_tables(static_gaze)
    use_tabs = defer_tables or tables is not None
    filt_np = np.asarray(filt, dtype=np.float32)
    gaze_in_sig = core.foveated and not use_tabs
    n_dev = _mesh_size(mesh)
    axes = _frame_axes(mesh)
    K, B = int(chunk_blocks), int(block_frames)

    step = _sharded_video_step(core, filt_np, mesh, use_tabs, gaze_in_sig,
                               log_contrast)

    def fn(carry_t, carry_r, chunk_t, chunk_r, *extra):
        tabs = extra[0] if use_tabs else None

        def body(c, xs):
            if gaze_in_sig:
                nt, nr, gz = xs
                Q, _, ct, cr = step(c[0], c[1], nt, nr, gz)
            elif use_tabs:
                nt, nr = xs
                Q, _, ct, cr = step(c[0], c[1], nt, nr, tabs)
            else:
                nt, nr = xs
                Q, _, ct, cr = step(c[0], c[1], nt, nr)
            return (ct, cr), Q

        xs = (chunk_t, chunk_r)
        if gaze_in_sig:
            xs = xs + (extra[0],)
        (ct, cr), Qs = jax.lax.scan(body, (carry_t, carry_r), xs)
        # (K, n_bands, 2, B) -> (n_bands, 2, K*B)
        return jnp.transpose(Qs, (1, 2, 0, 3)).reshape(
            Qs.shape[1], 2, K * B), ct, cr

    repl = NamedSharding(mesh, P())
    chunk_shard = NamedSharding(mesh, P(None, axes, None, None))
    base_shardings = (repl, repl, chunk_shard, chunk_shard)
    state = {}  # the tables' jit is built on first call (needs the pytree)

    def call(carry_t, carry_r, chunk_t, chunk_r, *extra):
        if chunk_t.shape[0] != K or chunk_t.shape[1] != B:
            raise ValueError(f"chunk shape {chunk_t.shape[:2]} != "
                             f"(chunk_blocks={K}, block_frames={B})")
        if B % n_dev != 0:
            raise ValueError(
                f"block size {B} not divisible by {n_dev} devices; pass "
                f"block_frames as a multiple of the device count")
        if use_tabs:
            tabs = extra[0] if extra else tables
            if "jit" not in state:
                state["jit"] = jax.jit(fn, in_shardings=base_shardings
                                       + (jax.tree.map(lambda _: repl, tabs),))
            return state["jit"](carry_t, carry_r, chunk_t, chunk_r, tabs)
        if "jit" not in state:
            gaze_sh = (NamedSharding(mesh, P(None, axes, None)),) \
                if gaze_in_sig else ()
            state["jit"] = jax.jit(fn, in_shardings=base_shardings + gaze_sh)
        return state["jit"](carry_t, carry_r, chunk_t, chunk_r, *extra)

    return call


def make_batch_scorer(core, mesh: Mesh, pool_params: dict, fov_tables=None,
                      defer_tables: bool = False, use_gaze: bool = False):
    """Batch-of-image-pairs scorer sharded over the whole mesh.

    The reference farms independent pairs out as one SLURM process per GPU
    (pyfvvdp/benchmark_cluster.sh); here a batch of pairs is one SPMD
    program: inputs (N, H, W) luminance with N divisible by the device
    count; each device scores its local pairs with the single-chip spatial
    core (Pallas engaged) and pools them to per-pair JODs.

    ``fov_tables``: static-gaze per-pixel CSF tables (core.fov_tables) for
    foveated scoring with one fixation point shared by all pairs; the tables
    are replicated across the mesh (they depend on the display geometry, not
    on the pair).  Pass ``defer_tables=True`` instead to get a
    ``fn(tests, refs, tables)`` that binds the tables per CALL, so a cached
    scorer serves every fixation point without recompiling.

    ``use_gaze=True`` instead makes the returned fn take a per-pair gaze
    array (N, 2) that shards WITH its pairs — the general foveated case
    (per-pair fixation points) via the per-frame trilinear CSF.

    Returns a jitted fn (tests, refs[, tables | gaze]) -> (N,) JOD scores.
    """
    import jax.numpy as jnp

    from fovvideovdp_tpu.ops import masking as mask_ops

    axes = _frame_axes(mesh)
    n_dev = _mesh_size(mesh)
    use_tabs = defer_tables or fov_tables is not None

    def pool_one(Q_pair):  # (n_bands, 2) -> scalar JOD
        return mask_ops.pool_to_jod(
            Q_pair[..., None], pool_params["w_transient"],
            pool_params["beta_sch"], pool_params["beta_tch"],
            pool_params["beta_t"], pool_params["jod_a"],
            pool_params["log_jod_exp"])

    def score_shard(tests, refs, *extra):  # (n_loc, H, W) each
        R = jnp.stack([tests, refs], axis=1)          # (n_loc, 2, H, W)
        if use_gaze:
            Q, _ = core.score_frames(R, extra[0], temp_ch=1)
        else:
            tabs = extra[0] if extra else None
            Q, _ = core.score_frames(R, None, temp_ch=1,
                                     fov_tables=tabs)  # (n_bands, 2, n_loc)
        return jax.vmap(pool_one, in_axes=2)(Q)       # (n_loc,)

    extra_specs = (P(axes, None),) if use_gaze else \
        ((P(),) if use_tabs else ())  # gaze shards with pairs; tables repl.
    sharded = jax.shard_map(score_shard, mesh=mesh,
                            in_specs=(P(axes, None, None),) * 2 + extra_specs,
                            out_specs=P(axes), check_vma=False)

    def fn(tests, refs, *extra):
        if tests.shape[0] % n_dev != 0:
            raise ValueError(f"batch {tests.shape[0]} not divisible by "
                             f"{n_dev} devices; pad the batch")
        return sharded(tests, refs, *extra)

    batch_sharding = NamedSharding(mesh, P(axes, None, None))
    if use_gaze:
        gaze_sharding = NamedSharding(mesh, P(axes, None))
        return jax.jit(fn, in_shardings=(batch_sharding, batch_sharding,
                                         gaze_sharding))
    if not use_tabs:
        return jax.jit(fn, in_shardings=(batch_sharding, batch_sharding))

    state = {}  # the jit is built on first call (needs the tables' pytree)

    def call(tests, refs, *maybe_tabs):
        tabs = maybe_tabs[0] if maybe_tabs else fov_tables
        if "jit" not in state:
            repl = jax.tree.map(lambda _: NamedSharding(mesh, P()), tabs)
            state["jit"] = jax.jit(
                fn, in_shardings=(batch_sharding, batch_sharding, repl))
        return state["jit"](tests, refs, tabs)

    return call


def make_batch_video_scorer(core, filt: np.ndarray, mesh: Mesh,
                            pool_params: dict, fov_tables=None,
                            defer_tables: bool = False,
                            use_gaze: bool = False):
    """Batch-of-video-pairs scorer: N independent clips in one SPMD program.

    Inputs (padded_tests, padded_refs): (N, B + fl - 1, H, W) luminance with
    N divisible by the device count (B output frames per clip).  Each device
    temporally filters and scores its local clips through the single-chip
    spatial core — clips never talk to each other, so the program has zero
    cross-device communication beyond the final JOD gather.  This retires
    the reference's SLURM job farming (one process per GPU) with one
    program over the mesh.

    Returns a jitted fn -> ((N,) JODs, Q_per_ch (n_bands, 2, N, B)).
    """
    import jax.numpy as jnp

    from fovvideovdp_tpu.ops import masking as mask_ops
    from fovvideovdp_tpu.ops import temporal as temporal_ops

    F_filt = jnp.asarray(filt)
    fl = filt.shape[1]
    axes = _frame_axes(mesh)
    n_dev = _mesh_size(mesh)
    use_tabs = defer_tables or fov_tables is not None

    def pool_one(Q_clip):  # (n_bands, 2, B) -> scalar JOD
        return mask_ops.pool_to_jod(
            Q_clip, pool_params["w_transient"], pool_params["beta_sch"],
            pool_params["beta_tch"], pool_params["beta_t"],
            pool_params["jod_a"], pool_params["log_jod_exp"])

    def score_shard(pt, pr, *extra):  # (n_loc, B + fl - 1, H, W)
        n_loc = pt.shape[0]
        B = pt.shape[1] - fl + 1
        Rt = jax.vmap(lambda x: temporal_ops.apply_temporal_filters(x, F_filt))(pt)
        Rr = jax.vmap(lambda x: temporal_ops.apply_temporal_filters(x, F_filt))(pr)
        # order: T-sust, R-sust, T-trans, R-trans (fvvdp.py:293)
        R = jnp.stack([Rt[:, :, 0], Rr[:, :, 0], Rt[:, :, 1], Rr[:, :, 1]],
                      axis=2)                          # (n_loc, B, 4, H, W)
        R = R.reshape((n_loc * B,) + R.shape[2:])
        if use_gaze:                                   # (n_loc, B, 2) gaze
            gaze = extra[0].reshape(n_loc * B, 2)
            Q, _ = core.score_frames(R, gaze, temp_ch=2)
        else:
            tabs = extra[0] if extra else None
            Q, _ = core.score_frames(R, None, temp_ch=2,
                                     fov_tables=tabs)  # (n_bands, 2, n_loc*B)
        Q = Q.reshape(Q.shape[0], 2, n_loc, B)
        jods = jax.vmap(pool_one, in_axes=2)(Q)        # (n_loc,)
        return jods, Q

    extra_specs = (P(axes, None, None),) if use_gaze else \
        ((P(),) if use_tabs else ())  # gaze shards with clips; tables repl.
    sharded = jax.shard_map(score_shard, mesh=mesh,
                            in_specs=(P(axes, None, None, None),) * 2
                            + extra_specs,
                            out_specs=(P(axes), P(None, None, axes, None)),
                            check_vma=False)

    def fn(padded_tests, padded_refs, *extra):
        if padded_tests.shape[0] % n_dev != 0:
            raise ValueError(f"batch {padded_tests.shape[0]} not divisible "
                             f"by {n_dev} devices; pad the batch")
        return sharded(padded_tests, padded_refs, *extra)

    batch_sharding = NamedSharding(mesh, P(axes, None, None, None))
    if use_gaze:
        gaze_sharding = NamedSharding(mesh, P(axes, None, None))
        return jax.jit(fn, in_shardings=(batch_sharding, batch_sharding,
                                         gaze_sharding))
    if not use_tabs:
        return jax.jit(fn, in_shardings=(batch_sharding, batch_sharding))

    state = {}  # the jit is built on first call (needs the tables' pytree)

    def call(pt, pr, *maybe_tabs):
        tabs = maybe_tabs[0] if maybe_tabs else fov_tables
        if "jit" not in state:
            repl = jax.tree.map(lambda _: NamedSharding(mesh, P()), tabs)
            state["jit"] = jax.jit(
                fn, in_shardings=(batch_sharding, batch_sharding, repl))
        return state["jit"](pt, pr, tabs)

    return call


def shard_image_fn(core, mesh: Mesh):
    """Sharded single-image scorer: rows or columns over 'space' (a lone
    image has no frame axis to shard).

    Spatial sharding cuts *through* the pyramid's convolutions, so this path
    deliberately traces the jnp spatial core and leaves halo exchange to
    XLA's SPMD partitioner; the Pallas kernels (whose pallas_call has no
    partitioning rule) are force-disabled for this trace.  The sharded axis
    is whichever of W / H divides the 'space' axis size (widths are usually
    nicer multiples than heights, e.g. 683x1024); if neither divides, the
    input stays replicated — still correct, XLA may shard internally.  For
    throughput scaling prefer make_batch_scorer — frame/pair parallelism
    keeps the kernels engaged.
    """
    import jax.numpy as jnp

    from fovvideovdp_tpu.ops import pallas as pallas_cfg

    space = dict(zip(mesh.axis_names, mesh.devices.shape)).get("space", 1)
    if space > 1 and core.plan.W % space == 0:
        spec = P(None, "space")
    elif space > 1 and core.plan.H % space == 0:
        spec = P("space", None)
    else:
        spec = P(None, None)
    img_sharding = NamedSharding(mesh, spec)

    def fn(T, Rf):
        with pallas_cfg.forced(False):
            R = jnp.stack([T, Rf], axis=0)[None]
            return core.score_frames(R, None, temp_ch=1)

    return jax.jit(fn, in_shardings=(img_sharding, img_sharding))
