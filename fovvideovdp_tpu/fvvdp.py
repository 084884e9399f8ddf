"""FovVideoVDP metric — public API.

The object shell mirrors the reference API (pyfvvdp/fvvdp.py:58-230:
constructor options, ``predict``, ``predict_video_source``, stats dict,
feature export) around the functional jit-compiled core in
:mod:`fovvideovdp_tpu.core`.  Orchestration differences from the reference:

* Frames are processed in blocks through one XLA program per (resolution,
  block size) instead of a per-frame Python loop; the temporal sliding window
  is carried between blocks as the trailing filter_len-1 padded frames.
* ``filter_len`` is per-call state, not object state (the reference mutates
  the instance per video, fvvdp.py:228).
* Heatmaps are rendered on device and transferred once per block as fp16 —
  or kept on device entirely (``device_heatmap=True``) when the caller
  post-processes them there (visual-loss training, on-device encoding),
  which removes the dominant cost of the heatmap path on slow transports.
"""
from __future__ import annotations

import json
import logging
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from fovvideovdp_tpu import utils
from fovvideovdp_tpu.core import MetricCore
from fovvideovdp_tpu.csf import CSFCache
from fovvideovdp_tpu.display_model import (fvvdp_display_geometry,
                                           fvvdp_display_photometry)
from fovvideovdp_tpu.ops import masking as mask_ops
from fovvideovdp_tpu.ops import temporal as temporal_ops
from fovvideovdp_tpu.ops.pyramid import PyramidPlan
from fovvideovdp_tpu.video_source import fvvdp_video_source_array

# Heuristic frame-block sizing: cap pixels-per-block so a 4K block still fits
# comfortably in HBM alongside its pyramid intermediates (a 30-frame 4K block
# keeps ~6 GB of temporaries live per in-flight dispatch on a 16 GB chip),
# while large enough to amortise per-dispatch latency and the fl-1 carry
# frames the temporal window re-reads each block (measured on v5e: 4K video
# e2e 279 fps at B=12 vs 316 at B=30 — the unchunked temporal kernel keeps
# whole blocks of this size in one VMEM pass).  The block size depends only
# on the resolution, so one compile per resolution serves any video length.
_BLOCK_PIXEL_BUDGET = 2.5e8
_MAX_BLOCK_FRAMES = 32
# block temporaries per pixel-frame (fp32 temporal responses x2 videos x4
# channels + padded pyramid copies), measured from 4K compile memory dumps
_BLOCK_TEMP_BYTES_PER_PX = 37


def _env_bytes(name: str, default: int) -> int:
    """Byte-count env override; malformed values fall back to the default
    with a warning instead of crashing the scoring call."""
    raw = os.environ.get(name)
    if raw is None or not raw.strip():
        return int(default)
    try:
        return int(raw)
    except ValueError:
        logging.warning(f"ignoring malformed {name}={raw!r}; "
                        f"using the default {default}")
        return int(default)


class fvvdp:
    """Full-reference foveated video/image quality metric (JOD units)."""

    def __init__(self, display_name="standard_4k", display_photometry=None,
                 display_geometry=None, color_space="sRGB", foveated=False,
                 heatmap=None, quiet=False, device=None, temp_padding="replicate",
                 use_checkpoints=False, block_frames=None,
                 do_temporal_channels=True, ignore_boundary_pixels=False,
                 band_callback=None, content_mapping=None,
                 parameter_overrides=None, device_heatmap=False,
                 heatmap_dtype="float16"):
        assert heatmap in [None, "none", "raw", "threshold", "supra-threshold",
                           "monochromatic"], "Unsupported heatmap type"
        assert temp_padding in ["replicate", "circular", "pingpong"], \
            "Unsupported temporal padding method"
        if heatmap_dtype not in ("float16", "uint8"):
            raise ValueError(f"heatmap_dtype must be 'float16' or 'uint8', "
                             f"got {heatmap_dtype!r}")
        if heatmap_dtype == "uint8" and heatmap == "raw":
            raise ValueError("heatmap_dtype='uint8' requires a colormapped "
                             "heatmap type, not 'raw'")

        self.quiet = quiet
        self.foveated = foveated
        self.heatmap = heatmap
        self.color_space = color_space
        self.temp_padding = temp_padding
        self.use_checkpoints = use_checkpoints
        self.block_frames = block_frames
        self.do_heatmap = heatmap is not None and heatmap != "none"
        # Keep stats["heatmap"] as a device (HBM-resident) array instead of
        # pulling fp16 frames to the host — a TPU-native extension: a 4K
        # 60-frame threshold heatmap is ~3 GB, which dominates end-to-end
        # time on anything slower than PCIe. Whole-video heatmaps must fit
        # in HBM; stream block-wise (host heatmaps) for long content.
        self.device_heatmap = device_heatmap
        # "uint8" quantises colormapped heatmaps on device ([0,1] RGB →
        # 0..255), halving host-readback bytes vs the reference's fp16
        # (pyfvvdp/fvvdp.py:471-477 keeps float16); "float16" matches the
        # reference layout/dtype exactly
        self.heatmap_dtype = heatmap_dtype
        self.device = device  # accepted for API compatibility; JAX manages devices
        # research/ablation options of the MATLAB core (fvvdp_core.m:60-77)
        self.do_temporal_channels = do_temporal_channels
        self.ignore_boundary_pixels = ignore_boundary_pixels
        self.band_callback = band_callback
        self.content_mapping = content_mapping

        self.set_display_model(display_name, display_photometry=display_photometry,
                               display_geometry=display_geometry)
        self.load_config(parameter_overrides)

        self.csf_cache = CSFCache()
        self.omega = (0.0, 5.0)
        self._luts = tuple(self.csf_cache.get(o, self.csf_sigma, self.k_cm)
                           for o in self.omega)
        self._cores: Dict = {}
        self._shard_fns: Dict = {}  # compiled sharded scorers, keyed per mesh

    # ------------------------------------------------------------------
    def load_config(self, parameter_overrides=None):
        self.parameters_file = utils.config_files.find("fvvdp_parameters.json")
        logging.debug(f"Loading FovVideoVDP parameters from '{self.parameters_file}'")
        parameters = utils.json2dict(self.parameters_file)
        if parameter_overrides:
            unknown = set(parameter_overrides) - set(parameters)
            if unknown:
                raise RuntimeError(f"Unknown metric parameter(s): {sorted(unknown)}")
            parameters = dict(parameters, **parameter_overrides)
        self.parameters = parameters

        self.mask_p = parameters["mask_p"]
        self.mask_c = parameters["mask_c"]
        self.pu_dilate = parameters["pu_dilate"]
        self.w_transient = parameters["w_transient"]
        self.beta = parameters["beta"]
        self.beta_t = parameters["beta_t"]
        self.beta_tch = parameters["beta_tch"]
        self.beta_sch = parameters["beta_sch"]
        self.sustained_sigma = parameters["sustained_sigma"]
        self.sustained_beta = parameters["sustained_beta"]
        self.csf_sigma = parameters["csf_sigma"]
        self.sensitivity_correction = parameters["sensitivity_correction"]
        self.masking_model = parameters["masking_model"]
        self.local_adapt = parameters["local_adapt"]
        self.contrast = parameters["contrast"]
        self.jod_a = parameters["jod_a"]
        self.log_jod_exp = parameters["log_jod_exp"]
        self.mask_q_sust = parameters["mask_q_sust"]
        self.mask_q_trans = parameters["mask_q_trans"]
        self.k_cm = parameters["k_cm"]
        self.filter_len = parameters["filter_len"]
        self.version = parameters["version"]
        self.debug = False

    def set_display_model(self, display_name="standard_4k", display_photometry=None,
                          display_geometry=None):
        if display_photometry is None:
            self.display_photometry = fvvdp_display_photometry.load(display_name)
            self.display_name = display_name
        else:
            self.display_photometry = display_photometry
            self.display_name = "unspecified"
        if display_geometry is None:
            self.display_geometry = fvvdp_display_geometry.load(display_name)
        else:
            self.display_geometry = display_geometry
        self.pix_per_deg = self.display_geometry.get_ppd()

    def update_device(self, device):
        """No-op under JAX (kept for API compatibility)."""
        self.device = device

    # ------------------------------------------------------------------
    def predict(self, test_cont, reference_cont, dim_order="BCFHW",
                frames_per_second=0, fixation_point=None, mesh=None):
        """Predict quality for arrays (numpy/JAX). Returns (Q_JOD, stats).

        ``mesh``: an optional ``jax.sharding.Mesh`` (e.g. ``make_mesh()``
        from :mod:`fovvideovdp_tpu.parallel`) to stream ONE video over
        several chips — output frames shard across the mesh and each device
        runs the single-chip spatial core on its local frames."""
        test_vs = fvvdp_video_source_array(
            test_cont, reference_cont, frames_per_second, dim_order=dim_order,
            display_photometry=self.display_photometry,
            color_space_name=self.color_space)
        return self.predict_video_source(test_vs, fixation_point=fixation_point,
                                         mesh=mesh)

    def _get_core(self, width: int, height: int) -> MetricCore:
        key = (width, height, self.foveated, self.heatmap,
               self.heatmap_dtype, self.ignore_boundary_pixels)
        if key not in self._cores:
            plan = PyramidPlan(width, height, self.pix_per_deg)
            try:
                peak = float(self.display_photometry.get_peak_luminance())
            except Exception:
                peak = None   # custom photometry without a peak: trim bottom only
            self._cores[key] = MetricCore(
                plan, self.parameters, self._luts,
                geometry=self.display_geometry, foveated=self.foveated,
                heatmap=self.heatmap, content_mapping=self.content_mapping,
                ignore_boundary_pixels=self.ignore_boundary_pixels,
                band_callback=self.band_callback, peak_luminance=peak,
                heatmap_dtype=self.heatmap_dtype)
        return self._cores[key]

    def _get_sharded_fn(self, key, filt=None):
        """Cache sharded scorers so repeat predicts reuse the compiled SPMD
        program (a fresh shard_map/jit per call would recompile every time)."""
        if key not in self._shard_fns:
            from fovvideovdp_tpu.parallel import (shard_image_fn,
                                                  shard_video_block_step_fn)
            kind, core, mesh = key[0], key[1], key[2]
            if kind == "image":
                self._shard_fns[key] = shard_image_fn(core, mesh)
            elif kind == "videoscan":
                from fovvideovdp_tpu.parallel import shard_video_scan_fn
                _, _, _, _, B, k, use_tables, log_c = key
                self._shard_fns[key] = shard_video_scan_fn(
                    core, filt, mesh, B, k, log_contrast=log_c,
                    defer_tables=use_tables)
            else:
                _, _, _, _, use_tables, log_c = key
                self._shard_fns[key] = shard_video_block_step_fn(
                    core, filt, mesh, log_contrast=log_c,
                    defer_tables=use_tables)
        return self._shard_fns[key]

    def _pick_block_size(self, height: int, width: int, n_frames: int,
                         table_bytes: int = 0) -> int:
        if self.block_frames is not None:
            return max(1, min(self.block_frames, n_frames))
        budget = _BLOCK_PIXEL_BUDGET
        if self.heatmap is not None:
            # heatmap blocks keep per-pixel visibility maps for every band
            # live through the block (plus the rendered RGB output), so the
            # same frame budget that streams scores compiles to a >HBM
            # program at 4K — 30-frame plain blocks measured 14.9 GB with
            # heatmap on.  A quarter budget (7 frames at 4K) is proven.
            budget /= 4
        by_mem = int(budget // (height * width))
        if table_bytes:
            # fixed-gaze per-pixel CSF tables stay HBM-resident through the
            # run (~1.6 GB at 4K), and the scorer programs stage padded
            # copies of table planes in their temporaries, so charge the
            # tables at 3x against the block budget (in units of the
            # measured ~37 B of block temporaries per pixel-frame).  The
            # multiplier is hardware-calibrated: a 1x charge (4K foveated
            # B=24) still exhausted the 15.75 GB chip at dispatch; 3x
            # (B=14) leaves multi-GB headroom for XLA staging + heap
            # fragmentation.
            by_mem -= int(-(-3 * table_bytes // (_BLOCK_TEMP_BYTES_PER_PX
                                                 * height * width)))
        return int(max(1, min(_MAX_BLOCK_FRAMES, by_mem, n_frames)))

    def predict_video_source(self, vid_source, fixation_point=None, mesh=None,
                             checkpoint_path=None, checkpoint_every=8):
        """Score a video source.  TPU-native extensions over the reference:

        ``mesh``: shard the streamed frames over a device mesh (see
        ``predict``).

        ``checkpoint_path``: persist streaming state (scored Q_per_ch,
        position, the filter_len-1 carry frames) every ``checkpoint_every``
        blocks, so a long scoring job killed mid-video resumes where it
        stopped instead of re-decoding and re-scoring from frame 0 (the
        reference has no job checkpointing — SURVEY.md section 5).  The file
        is written atomically, validated against the video/configuration
        fingerprint on resume, and removed on completion.  Not supported
        together with heatmaps (those would make the checkpoint as large as
        the output)."""
        height, width, N_frames = vid_source.get_video_size()

        n_dev = 1
        if mesh is not None:
            n_dev = int(np.prod(mesh.devices.shape))
            if n_dev == 1:
                mesh = None

        if fixation_point is None:
            fixation_point = np.array([width // 2, height // 2])
        fixation_point = np.asarray(fixation_point, dtype=np.float32)
        if fixation_point.ndim == 2 and fixation_point.shape[0] < N_frames:
            # caught here once: downstream the short trajectory would fail
            # with an opaque reshape/shape error deep inside the jitted path
            raise RuntimeError(
                f"fixation_point has {fixation_point.shape[0]} per-frame "
                f"rows but the video has {N_frames} frames; pass one (x, y) "
                f"point or at least one row per frame")
        # A non-moving fixation point lets the foveated CSF collapse to
        # per-pixel luminance tables computed once per video (core.fov_tables)
        static_gaze = None
        if self.foveated and fixation_point.ndim == 1 \
                and self.content_mapping is None:
            static_gaze = (float(fixation_point[0]), float(fixation_point[1]))

        core = self._get_core(width, height)
        plan = core.plan
        rho_band = plan.get_freqs()
        is_image = N_frames == 1

        if static_gaze is not None and not is_image \
                and self.do_temporal_channels \
                and os.environ.get("FVVDP_FOV_AUTOSELECT", "1") != "0":
            # Fixed-gaze auto-selection: the per-pixel CSF tables are
            # GB-scale at 4K and charge the HBM block budget so hard that
            # the strictly-harder moving-gaze path outruns the table path
            # (hardware: 110 vs 119 fps on 4K/60).  When the tables would
            # halve the block size AND the in-kernel trilinear kernel
            # supports this configuration, score the fixed gaze through the
            # moving kernel as a constant per-frame gaze — the fixed path
            # must never lose to the strictly-harder moving one.  JODs are
            # equal up to float noise (the kernel's trilinear and the
            # tables' collapse are the same interpolation, associativity).
            B_free = self._pick_block_size(height, width, N_frames, 0)
            B_tab = self._pick_block_size(height, width, N_frames,
                                          core.fov_table_bytes())
            if 2 * B_tab < B_free and core.mov_kernel_available():
                logging.debug(
                    f"fixed-gaze CSF tables would shrink the frame block "
                    f"{B_free} -> {B_tab}; scoring via the in-kernel "
                    f"trilinear path with a constant gaze instead")
                static_gaze = None

        heatmap_frames = [None] * N_frames \
            if self.do_heatmap and not self.device_heatmap else None
        heat_dev_blocks = [] if self.do_heatmap and self.device_heatmap else None
        scan_jod = None  # set by the scan path: pooled JOD, device scalar

        log_c = self.contrast == "log"

        def _enc(x):
            # log-contrast mode feeds log10 luminance into the pipeline
            return jnp.log10(jnp.clip(x, 1e-6, None)) if log_c else x

        pass_gaze = self.foveated and static_gaze is None
        if pass_gaze:
            # the moving-gaze path never reads the static-gaze per-pixel CSF
            # tables, but a previous fixed-gaze call may have left GB-scale
            # entries resident (one 4K entry is ~1.6 GB); evict them so the
            # in-kernel trilinear path gets the HBM back
            core.drop_fov_tables()

        if checkpoint_path and (is_image or not self.do_temporal_channels):
            logging.warning("checkpoint_path applies to the streaming video "
                            "path only; ignored for this input")
        if self.do_heatmap and self.device_heatmap:
            self._check_device_heatmap_budget(N_frames, height, width)
        self._exec_path = "image" if is_image else \
            ("ablation" if not self.do_temporal_channels else "stream")
        if is_image:
            t, r = vid_source.get_luminance_block(0, 1)
            t, r = _enc(t), _enc(r)
            if mesh is not None and not self.foveated:
                # one lone image: rows shard over the mesh's 'space' axis
                # (for throughput over many images use predict_batch instead)
                fn = self._get_sharded_fn(("image", core, mesh))
            else:
                if mesh is not None:
                    # refusing beats a warning that silently drops all but
                    # one of the requested devices (easy to miss in a batch
                    # job that "works")
                    raise RuntimeError(
                        "predict(mesh=...) does not shard single foveated "
                        "images; score it without a mesh, or shard many "
                        "foveated images with predict_batch(mesh=...)")
                fn = core.image_fn(static_gaze=static_gaze)
            if pass_gaze:
                gaze = self._gaze_for_frames(fixation_point, 0, 1, N_frames)
                Q_per_ch, heat = fn(t[0], r[0], jnp.asarray(gaze))
            else:
                Q_per_ch, heat = fn(t[0], r[0])
            # Q stays ON DEVICE: pooling dispatches against it directly and
            # the stats copy happens once at the end — downloading here and
            # re-uploading for pooling costs two transport round-trips
            if self.do_heatmap:
                if self.device_heatmap:
                    heat_dev_blocks.append(heat)
                else:
                    heatmap_frames[0] = np.asarray(heat[0])
        elif not self.do_temporal_channels:
            # Ablation: score every video frame as an independent image
            # (matlab/fvvdp_core.m:73,112).
            if mesh is not None:
                raise RuntimeError(
                    "predict(mesh=...) does not shard the "
                    "do_temporal_channels=False ablation path; run it "
                    "without a mesh (a silent single-device fallback would "
                    "waste the requested hardware)")
            B = self._pick_block_size(
                height, width, N_frames,
                table_bytes=core.fov_table_bytes() if static_gaze else 0)
            Q_per_ch = np.zeros((plan.height, 2, N_frames), dtype=np.float32)
            fn = core.image_block_fn(static_gaze=static_gaze)
            pending = []
            pos = 0
            while pos < N_frames:
                b = min(B, N_frames - pos)
                t, r = vid_source.get_luminance_block(pos, b)
                t, r = _enc(t), _enc(r)
                if b < B:
                    t = jnp.concatenate([t, jnp.repeat(t[-1:], B - b, axis=0)])
                    r = jnp.concatenate([r, jnp.repeat(r[-1:], B - b, axis=0)])
                if pass_gaze:
                    gaze = self._gaze_for_frames(fixation_point, pos, b, N_frames)
                    if b < B:
                        gaze = np.concatenate(
                            [gaze, np.repeat(gaze[-1:], B - b, axis=0)], axis=0)
                    Q_blk, heat = fn(t, r, jnp.asarray(gaze))
                else:
                    Q_blk, heat = fn(t, r)
                pending.append((pos, b, Q_blk, heat))
                self._start_fetch(pending[-1], self.device_heatmap)
                # pipeline depth 2: the device stays >= 1 full block ahead of
                # the blocking host read-back
                while len(pending) > 2:
                    self._drain_block(pending.pop(0), Q_per_ch,
                                      heatmap_frames, heat_dev_blocks)
                pos += b
            while pending:
                self._drain_block(pending.pop(0), Q_per_ch, heatmap_frames,
                                  heat_dev_blocks)
        else:
            fps = vid_source.get_frames_per_second()
            fl = temporal_ops.filter_len_for_fps(fps)
            filt = temporal_ops.temporal_filters(
                fps, fl, self.sustained_sigma, self.sustained_beta)
            pad_idx = temporal_ops.padding_indices(N_frames, fl, self.temp_padding)

            B = self._pick_block_size(
                height, width, N_frames,
                table_bytes=core.fov_table_bytes() if static_gaze else 0)
            if mesh is not None:
                # shard output frames over the mesh: blocks must split evenly
                B = -(-B // n_dev) * n_dev
            Q_per_ch = np.zeros((plan.height, 2, N_frames), dtype=np.float32)
            stream_idx = pad_idx[fl - 1:]  # frame index feeding each output frame

            self._exec_path = "stream"  # introspection for tests/diagnostics
            # On success the scan returns its POOLED device scalar (Q_per_ch
            # is filled as a side effect); None means "use the streaming
            # loop".  The scalar rides to the common tail below — no hidden
            # instance state, safe for sequential reuse of one metric.
            scan_jod = None if checkpoint_path else self._try_scan_video(
                vid_source, core, filt, fl, B, pad_idx, stream_idx,
                Q_per_ch, static_gaze, fixation_point, pass_gaze,
                log_c, N_frames, height, width, mesh=mesh)
            if scan_jod is None:
                if checkpoint_path and self.do_heatmap:
                    raise RuntimeError("checkpoint_path is not supported together "
                                       "with heatmaps")
                if checkpoint_path and not vid_source.supports_random_access():
                    raise RuntimeError(
                        "checkpoint/resume needs a random-access video source "
                        "(resuming must skip already-scored frames): use "
                        "preload=True, a .yuv file, or array input")
                fingerprint = None
                if checkpoint_path:
                    import zlib
                    pad_code = {"replicate": 0, "circular": 1, "pingpong": 2}[
                        self.temp_padding]  # NB: hash(str) is per-process random
                    # content+config probe: the first LUMINANCE frame folds in the
                    # pixels, the photometry (display/EOTF/peak), and the colour
                    # space — one extra frame decode on resume, so a checkpoint
                    # from a different video or display model is never mixed in
                    p_t, p_r = vid_source.get_luminance_block(0, 1)
                    probe = np.float64(np.sum(np.asarray(p_t, np.float64))
                                       + 2.0 * np.sum(np.asarray(p_r, np.float64)))
                    # calibration + gaze trajectory: resuming under different
                    # metric parameters or a different fixation path must start
                    # fresh, not silently mix the two configurations
                    cfg_crc = zlib.crc32(json.dumps(
                        self.parameters, sort_keys=True).encode())
                    gaze_crc = zlib.crc32(np.ascontiguousarray(
                        fixation_point, np.float32).tobytes())
                    fingerprint = np.asarray(
                        [height, width, N_frames, fl, B, pad_code,
                         int(round(fps * 1000)), int(round(self.pix_per_deg * 1e3)),
                         int(self.foveated), int(log_c), cfg_crc, gaze_crc,
                         int(self.content_mapping is not None),
                         np.float64(probe).view(np.int64)], np.int64)
                start_pos, carry_t, carry_r = self._load_checkpoint(
                    checkpoint_path, fingerprint, Q_per_ch)
                if carry_t is None:
                    # Warm-up frames: the first fl-1 entries of the padded sequence.
                    carry_t, carry_r = vid_source.get_indexed_luminance_block(
                        pad_idx[:fl - 1])
                    carry_t, carry_r = _enc(carry_t), _enc(carry_r)
                if mesh is not None:
                    # CSF tables for a fixed gaze bind per CALL, so one cached
                    # SPMD program serves every fixation point
                    fov_tabs = core._static_fov_tables(static_gaze)
                    raw = self._get_sharded_fn(
                        ("videostep", core, mesh, filt.tobytes(),
                         fov_tabs is not None, log_c), filt=filt)
                    fn = raw if fov_tabs is None else \
                        (lambda ct, cr, nt, nr: raw(ct, cr, nt, nr, fov_tabs))
                else:
                    fn = core.video_block_step_fn(filt, static_gaze=static_gaze,
                                                  log_contrast=log_c)

                # The block loop is software-pipelined: device work for block k+1
                # is dispatched before block k's results are pulled to the host,
                # so host->device transfer and decode overlap TPU compute.
                pending = []  # [(pos, b, Q_blk, heat)] not yet materialised
                pos = start_pos
                blocks_done = 0
                while pos < N_frames:
                    b = min(B, N_frames - pos)
                    blk = stream_idx[pos:pos + b]
                    if np.array_equal(blk, np.arange(pos, pos + b)):
                        new_t, new_r = vid_source.get_luminance_block(pos, b)
                    else:  # circular/pingpong padding reorders the first frames
                        new_t, new_r = vid_source.get_indexed_luminance_block(blk)
                    if b < B:
                        # Pad the tail block by repeating the last frame so every
                        # block compiles to the same shape; the extra outputs are
                        # discarded below.  (_enc is applied inside the step fn.)
                        rep = jnp.repeat(new_t[-1:], B - b, axis=0)
                        new_t = jnp.concatenate([new_t, rep], axis=0)
                        new_r = jnp.concatenate([new_r, jnp.repeat(new_r[-1:], B - b,
                                                                   axis=0)], axis=0)
                    if pass_gaze:
                        gaze = self._gaze_for_frames(fixation_point, pos, b, N_frames)
                        if b < B:
                            gaze = np.concatenate(
                                [gaze, np.repeat(gaze[-1:], B - b, axis=0)], axis=0)
                        Q_blk, heat, carry_t, carry_r = fn(
                            carry_t, carry_r, new_t, new_r, jnp.asarray(gaze))
                    else:
                        Q_blk, heat, carry_t, carry_r = fn(
                            carry_t, carry_r, new_t, new_r)

                    pending.append((pos, b, Q_blk, heat))
                    self._start_fetch(pending[-1], self.device_heatmap)
                    # pipeline depth 2: the device stays >= 1 full block ahead of
                    # the blocking host read-back
                    while len(pending) > 2:
                        self._drain_block(pending.pop(0), Q_per_ch,
                                          heatmap_frames, heat_dev_blocks)
                    pos += b
                    blocks_done += 1
                    if checkpoint_path and pos < N_frames \
                            and blocks_done % max(1, checkpoint_every) == 0:
                        while pending:  # Q values up to pos must be final on host
                            self._drain_block(pending.pop(0), Q_per_ch,
                                              heatmap_frames, heat_dev_blocks)
                        self._save_checkpoint(checkpoint_path, fingerprint, pos,
                                              Q_per_ch, carry_t, carry_r)
                while pending:
                    self._drain_block(pending.pop(0), Q_per_ch, heatmap_frames,
                                      heat_dev_blocks)
                if checkpoint_path and os.path.isfile(checkpoint_path):
                    os.remove(checkpoint_path)

        Q_jod = scan_jod if scan_jod is not None \
            else self.do_pooling_and_jods(jnp.asarray(Q_per_ch))

        stats = {
            "Q_per_ch": np.asarray(Q_per_ch),
            "rho_band": rho_band,
            "frames_per_second": vid_source.get_frames_per_second(),
            "width": width,
            "height": height,
            "N_frames": N_frames,
        }
        if self.do_heatmap:
            # (1, c, F, H, W) — float16 (the reference's layout/dtype) or
            # uint8 when heatmap_dtype="uint8"
            if self.device_heatmap:
                full = heat_dev_blocks[0] if len(heat_dev_blocks) == 1 \
                    else jnp.concatenate(heat_dev_blocks, axis=0)
                stats["heatmap"] = jnp.transpose(full, (1, 0, 2, 3))[None]
            else:
                stats["heatmap"] = np.stack(heatmap_frames, axis=1)[None]
        return float(Q_jod), stats

    # whole-video device heatmaps accumulate in HBM; refuse jobs that would
    # OOM the chip mid-video instead of after minutes of scoring
    _DEVICE_HEATMAP_MAX_BYTES_DEFAULT = 8 << 30

    def _check_device_heatmap_budget(self, n_frames, height, width):
        budget = _env_bytes("FVVDP_DEVICE_HEATMAP_MAX_BYTES",
                            self._DEVICE_HEATMAP_MAX_BYTES_DEFAULT)
        channels = 1 if self.heatmap == "raw" else 3
        elsize = 1 if self.heatmap_dtype == "uint8" else 2
        est = n_frames * channels * height * width * elsize
        if est > budget:
            raise RuntimeError(
                f"device_heatmap=True would accumulate ~{est / 2**30:.1f} GiB "
                f"of heatmap in device memory ({n_frames} frames x {channels} "
                f"x {height}x{width} {self.heatmap_dtype}), over the "
                f"{budget / 2**30:.1f} GiB budget "
                f"($FVVDP_DEVICE_HEATMAP_MAX_BYTES). Use device_heatmap="
                f"False to stream heatmap frames to the host instead")

    @staticmethod
    def _load_checkpoint(path, fingerprint, Q_per_ch):
        """Resume streaming state saved by _save_checkpoint.  Returns
        (start_pos, carry_t, carry_r); carries are None on a fresh start.
        A fingerprint mismatch (different video/config) starts fresh rather
        than silently mixing state."""
        if not path or not os.path.isfile(path):
            return 0, None, None
        try:
            d = np.load(path)
            if not np.array_equal(d["fingerprint"], fingerprint):
                logging.warning(f"checkpoint '{path}' belongs to a different "
                                f"video/configuration; starting fresh")
                return 0, None, None
            Q_per_ch[...] = d["Q_per_ch"]
            pos = int(d["pos"])
            logging.info(f"resuming from checkpoint '{path}' at frame {pos}")
            return pos, jnp.asarray(d["carry_t"]), jnp.asarray(d["carry_r"])
        except Exception as e:  # truncated/corrupt file: score from scratch
            logging.warning(f"could not read checkpoint '{path}' ({e}); "
                            f"starting fresh")
            return 0, None, None

    @staticmethod
    def _save_checkpoint(path, fingerprint, pos, Q_per_ch, carry_t, carry_r):
        tmp = path + ".tmp.npz"  # explicit suffix: np.savez appends .npz
        np.savez(tmp, fingerprint=fingerprint, pos=np.int64(pos),
                 Q_per_ch=Q_per_ch, carry_t=np.asarray(carry_t),
                 carry_r=np.asarray(carry_r))
        os.replace(tmp, path)

    @staticmethod
    def _start_fetch(pending_entry, device_heatmap: bool) -> None:
        """Begin the device->host copy of a just-dispatched block's results
        WITHOUT blocking.  The copy then runs concurrently with the next
        block's compute and upload (full-duplex on PCIe and on the tunnel),
        so by the time _drain_block needs the bytes they are already local —
        heatmap readback (the dominant cost of the heatmap path on slow
        transports) overlaps instead of serialising after scoring."""
        _, _, Q_blk, heat = pending_entry
        for arr in ((Q_blk,) if device_heatmap or heat is None
                    else (Q_blk, heat)):
            try:
                arr.copy_to_host_async()
            except Exception:
                pass  # backend without async copies: drain stays correct

    @staticmethod
    def _drain_block(pending, Q_per_ch, heatmap_frames, heat_dev_blocks=None):
        """Materialise a finished block's device results on the host (or keep
        the heatmap on device when ``device_heatmap`` is set)."""
        pos, b, Q_blk, heat = pending
        Q_per_ch[:, :, pos:pos + b] = np.asarray(Q_blk)[:, :, :b]
        if heat is not None:
            if heat_dev_blocks is not None:
                heat_dev_blocks.append(heat[:b])
            elif heatmap_frames is not None:
                heat_np = np.asarray(heat)
                for i in range(b):
                    heatmap_frames[pos + i] = heat_np[i]

    # ------------------------------------------------------------------
    # chunked-scan whole-video scoring (device-resident sources)
    # ------------------------------------------------------------------
    # Scan chunk sizes in blocks, largest first.  Any video length decomposes
    # into this ladder plus reuse, so at most len(ladder) scan programs are
    # ever compiled per (resolution, B, config) — a whole-video scan would
    # pay a fresh trace+compile for every distinct duration.  Rungs whose
    # gathered fp32 luminance chunk doesn't fit the HBM headroom are dropped
    # per (resolution, config) — still length-independent.
    _SCAN_CHUNK_BLOCKS = (8, 2, 1)

    @staticmethod
    def _oom_like(e: Exception) -> bool:
        """Does this exception look like a device-memory exhaustion?  Through
        the axon tunnel a compile-time HBM OOM surfaces as an opaque INTERNAL
        remote_compile HTTP 500 (the 'Ran out of memory in memory space hbm'
        detail stays in the terminal log), so that shape counts too."""
        msg = str(e)
        return ("RESOURCE_EXHAUSTED" in msg
                or "Resource exhausted" in msg
                or "Ran out of memory" in msg
                or ("remote_compile" in msg and "HTTP 500" in msg))

    @classmethod
    def _wait_for_device_memory(cls, timeout_s: float = 30.0) -> None:
        """Block until the device accepts a small allocation again.

        After an HBM OOM aborts an async dispatch, the runtime releases the
        program's buffers asynchronously (and through the axon tunnel, with
        extra lag) — an immediate follow-up allocation can fail even though
        the Python references are gone.  Polls a tiny device_put with backoff;
        gives up silently after ``timeout_s`` (the next real allocation will
        then raise with full context).  Only resource-exhausted-shaped errors
        are retried — a wedged or disconnected backend fails fast so its real
        error surfaces downstream instead of after a silent 30 s stall."""
        import gc
        import time as _time
        gc.collect()
        deadline = _time.monotonic() + timeout_s
        delay = 0.05
        while True:
            try:
                jax.block_until_ready(jax.device_put(np.zeros(8, np.float32)))
                return
            except Exception as e:
                if not cls._oom_like(e):
                    logging.debug(f"_wait_for_device_memory: non-OOM probe "
                                  f"error, not retrying: {e}")
                    return
                if _time.monotonic() >= deadline:
                    logging.debug("_wait_for_device_memory: device still "
                                  "refusing allocations at the deadline")
                    return
                _time.sleep(delay)
                delay = min(delay * 2, 2.0)

    @staticmethod
    def _hbm_capacity_bytes() -> int:
        """Allocatable device-memory bound for scan working-set planning."""
        try:
            st = jax.devices()[0].memory_stats() or {}
            if st.get("bytes_limit"):
                return int(st["bytes_limit"])
        except Exception:
            pass
        return int(15.75 * 2 ** 30)  # one 16 GB v5e chip's usable HBM

    def _try_scan_video(self, vid_source, core, filt, fl, B, pad_idx,
                        stream_idx, Q_per_ch, static_gaze, fixation_point,
                        pass_gaze, log_c, N_frames, height, width, mesh=None):
        """Score the video in a few chained scan dispatches when safe.

        With ``mesh`` set, each chunk is ONE SPMD program over the whole
        mesh: the scan body is the sharded streaming step (every block's B
        frames shard over the devices), so an n-chip mesh also scores a
        whole video in a handful of dispatches instead of one per block —
        see parallel.shard_video_scan_fn.

        Engages when the source's luminance blocks are pure device-side
        slices (so streaming's pipelining has no host work left to hide), no
        heatmap/checkpoint per-block readback is needed, and at least a
        2-block chunk fits the estimated HBM headroom (capacity minus the
        resident raw frames, fixed-gaze CSF tables and block temporaries;
        override the capacity bound with $FVVDP_SCAN_HBM_CAP_BYTES; the
        deprecated $FVVDP_SCAN_MAX_BYTES is still honoured as a
        luminance-chunk budget, its original meaning).  Fills
        ``Q_per_ch`` and returns the POOLED JOD (device scalar; pooling is
        dispatched against the device-resident Q so the host never
        round-trips it), or returns None to fall back to the pipelined
        streaming loop.  Each chunk's luminance is gathered to
        fp32 just before its dispatch and freed after, so the peak working
        set is one chunk — NOT the whole video — and any video length can
        scan.  Each chunk's scan body is the streaming step itself
        (core.video_scan_fn), so both paths compute identical numerics; what
        the scan removes is the per-block dispatch round-trip, which
        dominates on slow transports.  Chunks come from the fixed ladder
        _SCAN_CHUNK_BLOCKS, chained through the temporal carry, so a new
        video length never compiles a new program once the ladder is warm.
        Set FVVDP_DISABLE_SCAN=1 to force the streaming loop.
        """
        if self.do_heatmap or not vid_source.luminance_is_device_resident():
            return None
        if os.environ.get("FVVDP_DISABLE_SCAN", "") == "1":
            return None
        n_blocks = -(-N_frames // B)
        total = n_blocks * B
        px = height * width
        resident = int(getattr(vid_source, "device_resident_bytes",
                               lambda: 0)())
        if static_gaze is not None:
            # fixed-gaze per-pixel CSF tables ride along as scan arguments
            resident += core.fov_table_bytes()
        # length-independent working set: raw frames + tables + per-block
        # temporaries + the fl-1 carry pair
        fixed = resident + _BLOCK_TEMP_BYTES_PER_PX * B * px \
            + (fl - 1) * px * 4 * 2
        per_block_pair = B * px * 4 * 2  # gathered fp32 luminance per block
        cap_env = _env_bytes("FVVDP_SCAN_HBM_CAP_BYTES", 0)
        legacy = _env_bytes("FVVDP_SCAN_MAX_BYTES", 0)
        if legacy and not cap_env:
            # honour the pre-rename variable under its ORIGINAL meaning — a
            # budget for the gathered fp32 luminance chunks themselves — so
            # an existing "2 GiB" setting still means "scan small videos"
            # rather than silently flipping to "never scan"
            logging.warning(
                "FVVDP_SCAN_MAX_BYTES is deprecated and is interpreted as a "
                "luminance-chunk budget (its original meaning); set "
                "FVVDP_SCAN_HBM_CAP_BYTES to bound total device capacity "
                "instead")
            headroom = legacy
        else:
            cap = cap_env \
                or self._hbm_capacity_bytes() - (3 << 29)  # alloc/frag slack
            headroom = cap - fixed
        logging.debug(
            f"scan budget: headroom {headroom} B for luminance chunks "
            f"(fixed working set {fixed} B, per-block pair {per_block_pair} B)")
        # the moving-gaze scan body keeps per-level view-direction planes and
        # trilinear LUT state beyond the 37 B/px-frame temp estimate; on
        # hardware a 4K/60 moving-gaze scan OOMed with the estimate showing
        # 64 MB of margin while the byte-identical plain estimate fit
        # (docs/hw_campaign_r4.log stage 2) — demand 25% real margin before
        # attempting a scan whose failure costs a wasted compile plus an
        # HBM-recovery stall
        margin = 1.25 if pass_gaze else 1.0
        if headroom < 2 * margin * per_block_pair:
            # a 1-block chunk would just be the streaming loop without its
            # readback/decode pipelining — not worth taking
            return None
        rungs = tuple(k for k in self._SCAN_CHUNK_BLOCKS
                      if k * margin * per_block_pair <= headroom)
        # padded source schedule: fl-1 warm-up frames + the per-output-frame
        # stream order + the last frame repeated out to a whole block (the
        # tail outputs are sliced away; the temporal window is causal, so
        # they cannot influence the kept frames)
        full_idx = np.concatenate(
            [pad_idx, np.repeat(stream_idx[-1:], total - N_frames)])
        gaze_all = None
        if pass_gaze:
            gaze = self._gaze_for_frames(fixation_point, 0, N_frames, N_frames)
            if total > N_frames:
                gaze = np.concatenate(
                    [gaze, np.repeat(gaze[-1:], total - N_frames, axis=0)])
            gaze_all = gaze.reshape(n_blocks, B, 2)
        # greedy ladder decomposition (ladder ends at 1, so rem reaches 0)
        sched = []
        rem = n_blocks
        for k in rungs:
            n, rem = divmod(rem, k)
            sched.extend([k] * n)
        try:
            head_t, head_r = vid_source.get_indexed_luminance_block(
                full_idx[:fl - 1])
            if log_c:
                carry_t = jnp.log10(jnp.clip(head_t, 1e-6, None))
                carry_r = jnp.log10(jnp.clip(head_r, 1e-6, None))
            else:
                carry_t, carry_r = head_t, head_r
            del head_t, head_r
            fov_tabs = core._static_fov_tables(static_gaze) \
                if mesh is not None else None
            Q_chunks = []
            ofs = 0  # position in blocks
            for k in sched:
                if mesh is None:
                    fn = core.video_scan_fn(filt, B, k,
                                            static_gaze=static_gaze,
                                            log_contrast=log_c)
                else:
                    fn = self._get_sharded_fn(
                        ("videoscan", core, mesh, filt.tobytes(), B, k,
                         fov_tabs is not None, log_c), filt=filt)
                lo = fl - 1 + ofs * B
                # gather THIS chunk's fp32 luminance only; the buffers die
                # with the loop iteration, so peak HBM holds one chunk
                t_k, r_k = vid_source.get_indexed_luminance_block(
                    full_idx[lo:lo + k * B])
                if mesh is not None:
                    # pre-blocked (k, B, H, W): the frame axis (1) shards
                    # over the mesh unambiguously (a flat k*B axis would
                    # leave the reshape's sharding to GSPMD inference)
                    t_k = t_k.reshape((k, B) + t_k.shape[1:])
                    r_k = r_k.reshape((k, B) + r_k.shape[1:])
                    if fov_tabs is not None:
                        Q_k, carry_t, carry_r = fn(carry_t, carry_r, t_k,
                                                   r_k, fov_tabs)
                    elif pass_gaze:
                        Q_k, carry_t, carry_r = fn(
                            carry_t, carry_r, t_k, r_k,
                            jnp.asarray(gaze_all[ofs:ofs + k]))
                    else:
                        Q_k, carry_t, carry_r = fn(carry_t, carry_r, t_k, r_k)
                elif pass_gaze:
                    Q_k, carry_t, carry_r = fn(
                        carry_t, carry_r, t_k, r_k,
                        jnp.asarray(gaze_all[ofs:ofs + k]))
                else:
                    Q_k, carry_t, carry_r = fn(carry_t, carry_r, t_k, r_k)
                del t_k, r_k
                Q_chunks.append(Q_k)
                ofs += k
                # chain synchronously: enqueueing the NEXT chunk's gather
                # before this chunk retires would claim its output buffers
                # early and hold two chunks in HBM at once.  After the LAST
                # chunk there is nothing to protect — skipping the sync
                # saves a transport round-trip per predict and lets the
                # pooling program queue behind the scan.
                if ofs * B < total:
                    carry_t.block_until_ready()
            Q_all = Q_chunks[0] if len(Q_chunks) == 1 \
                else jnp.concatenate(Q_chunks, axis=2)
            Q_dev = Q_all[:, :, :N_frames]
            # pooling dispatches against the device-resident Q first (no
            # download -> re-upload round-trip); the blocking host copy for
            # Q_per_ch then runs INSIDE this try on purpose: a deferred
            # execution-time OOM from the (unsynced) last chunk surfaces at
            # this sync, where the except below can still degrade to the
            # streaming loop — r4's observed hardware OOM surfaced exactly
            # at a post-dispatch sync (docs/hw_campaign_r4.log stage 2).
            jod_dev = self.do_pooling_and_jods(Q_dev)
            Q_per_ch[:] = np.asarray(Q_dev)
        except Exception as e:
            # an HBM-oversubscribed dispatch must degrade to streaming, not
            # kill the job: the budget above is an estimate, not a guarantee
            # (see _oom_like for the tunnel-specific error shapes).  If the
            # program is genuinely uncompilable the smaller streaming
            # program re-raises below.
            if not self._oom_like(e):
                raise
            logging.warning(f"scan path exhausted device memory ({e}); "
                            f"falling back to the streaming loop")
            # The failed dispatch's argument buffers (a multi-GB gathered
            # luminance chunk) are still referenced by this frame and by the
            # exception's traceback, and the wedged program may hold them on
            # device past the Python frees — observed on hardware: after a
            # 4K moving-gaze scan OOM even a scalar device_put raised
            # RESOURCE_EXHAUSTED, killing the fallback this handler promises
            # (docs/hw_campaign_r4.log stage 2).  Drop every chunk-scale
            # reference, break the traceback cycle, then block until the
            # device can allocate again before handing over to streaming.
            # A chained exception (the runtime wrapping RESOURCE_EXHAUSTED,
            # or a failure inside another handler) keeps its own frames via
            # __cause__/__context__ — break those too, or the chunk buffers
            # stay referenced through them.
            e.__traceback__ = None
            for linked in (e.__cause__, e.__context__):
                if linked is not None:
                    linked.__traceback__ = None
            e.__cause__ = e.__context__ = None
            del e, linked
            head_t = head_r = carry_t = carry_r = t_k = r_k = None
            Q_chunks = Q_all = Q_dev = jod_dev = None
            self._wait_for_device_memory()
            return None
        self._exec_path = "scan"
        return jod_dev

    def _gaze_for_frames(self, fixation_point: np.ndarray, start: int, count: int,
                         n_frames: int) -> np.ndarray:
        if fixation_point.ndim == 2:
            return fixation_point[start:start + count].astype(np.float32)
        return np.broadcast_to(fixation_point.astype(np.float32),
                               (count, 2)).copy()

    # ------------------------------------------------------------------
    # batched scoring (N independent pairs in one SPMD program)
    # ------------------------------------------------------------------
    def predict_batch(self, test_conts, reference_conts, dim_order="BCFHW",
                      frames_per_second=0, mesh=None, fixation_point=None):
        """Score a batch of N test/reference pairs in ONE SPMD program.

        The batch axis is sharded over the device mesh (all devices by
        default); each device scores its local pairs with the single-chip
        core, so throughput scales linearly with chips and there is no
        cross-pair communication.  This replaces the reference's job-level
        SLURM farming (pyfvvdp/benchmark_cluster.sh) with one program.

        Inputs follow ``predict`` conventions but with a leading batch axis
        (any ``dim_order`` containing 'B').  Videos are scored whole-clip in
        device memory: N * n_frames * H * W floats must fit across the mesh.
        Foveated gaze options: one fixed ``fixation_point`` (x, y) shared by
        all pairs (default: the screen centre; fastest — the CSF collapses
        once to per-pixel tables replicated across the mesh), per-pair
        (N, 2) fixation points, or a per-frame (N, F, 2) moving gaze (both
        shard with their pairs and use the per-frame trilinear CSF).

        Returns (Q_JOD (N,) np.ndarray, stats dict).
        """
        import jax

        from fovvideovdp_tpu.parallel import (make_batch_scorer,
                                              make_batch_video_scorer,
                                              make_mesh)
        from fovvideovdp_tpu.video_source import (_batch_to_luminance,
                                                  reshuffle_dims)

        gaze_mode = None  # None | "tables" (shared fixed) | "per_pair"
        if self.foveated:
            if self.content_mapping is not None:
                raise RuntimeError("predict_batch does not support foveated "
                                   "content mapping")
            fp = np.asarray([0, 0] if fixation_point is None
                            else fixation_point, dtype=np.float32)
            if fp.ndim == 1 and fp.shape[0] == 2:
                gaze_mode = "tables"   # one fixed gaze: per-pixel CSF tables
            elif fp.ndim in (2, 3) and fp.shape[-1] == 2:
                gaze_mode = "per_pair"  # per-pair (N,2) / per-frame (N,F,2)
            else:
                raise RuntimeError(
                    "fixation_point must be (x, y) shared by all pairs, "
                    "(N, 2) per pair, or (N, F, 2) per frame")
        if "B" not in dim_order.upper():
            raise RuntimeError("predict_batch needs a batch axis; include "
                               "'B' in dim_order")

        t = reshuffle_dims(np.asarray(test_conts), dim_order, "BCFHW")
        r = reshuffle_dims(np.asarray(reference_conts), dim_order, "BCFHW")
        if t.shape != r.shape:
            raise RuntimeError("Test and reference batches must have the "
                               "same shape")
        N, C, F, H, W = t.shape
        if F > 1 and frames_per_second <= 0:
            raise RuntimeError("When passing video sequences, you must set "
                               "'frames_per_second' parameter")
        if C not in (1, 3):
            raise RuntimeError("The content must have either 1 or 3 colour "
                               "channels.")

        if mesh is None:
            mesh = make_mesh()
        n_dev = int(np.prod(mesh.devices.shape))
        # Multi-host (DCN) batch farming: each process passes ITS OWN pairs
        # (same count per process); the batch axis shards over every device
        # of every host and only the final JODs cross hosts.  This is the
        # SPMD replacement for the reference's one-SLURM-job-per-GPU farming
        # (pyfvvdp/benchmark_cluster.sh).
        n_proc = jax.process_count()
        from jax.sharding import NamedSharding, PartitionSpec as P
        axes = tuple(mesh.axis_names)
        if n_proc > 1:
            from fovvideovdp_tpu.parallel import (local_batch_to_global,
                                                  local_row_positions,
                                                  replicate_to_hosts)
            local_devs = [d for d in mesh.devices.flat
                          if d.process_index == jax.process_index()]
            if not local_devs:
                raise RuntimeError("mesh holds no devices of this process")
            pad_unit = len(local_devs)
        else:
            pad_unit = n_dev

        colorspaces = utils.json2dict(utils.config_files.find("color_spaces.json"))
        rgb2y = tuple(float(c) for c in colorspaces[self.color_space]["RGB2Y"])

        # pad the batch to a multiple of the (local) device count BEFORE the
        # upload (cheap on the raw host dtype); extras are replicas of the
        # last pair, sliced off below
        pad = (-N) % pad_unit
        if pad:
            t = np.concatenate([t, np.repeat(t[-1:], pad, axis=0)])
            r = np.concatenate([r, np.repeat(r[-1:], pad, axis=0)])
        if n_proc > 1:
            # unequal per-process counts would compile mismatched programs
            # (collective deadlock) or silently mis-attribute result rows —
            # check loudly first
            from jax.experimental import multihost_utils
            counts = np.asarray(multihost_utils.process_allgather(
                np.asarray([N + pad], np.int64))).ravel()
            if not np.all(counts == counts[0]):
                raise RuntimeError(
                    "predict_batch requires the same (padded) pair count on "
                    f"every process; got {counts.tolist()}")

        # upload the RAW batch already sharded over the mesh, so neither the
        # uint frames nor the fp32 luminance ever materialise on one device
        # ('fit across the mesh' means exactly that) — the EOTF jit follows
        # its input sharding and computes distributed
        spec5 = P(axes, None, None, None, None)
        if n_proc > 1:
            t_dev = local_batch_to_global(mesh, spec5, t)
            r_dev = local_batch_to_global(mesh, spec5, r)
        else:
            sh5 = NamedSharding(mesh, spec5)
            t_dev = jax.device_put(t, sh5)
            r_dev = jax.device_put(r, sh5)
        # shared jitted program keyed by the hashable photometry — repeat
        # predict_batch calls must not retrace the EOTF pipeline
        lum_t = _batch_to_luminance(t_dev, self.display_photometry, rgb2y)
        lum_r = _batch_to_luminance(r_dev, self.display_photometry, rgb2y)
        if self.contrast == "log":
            lum_t = jnp.log10(jnp.clip(lum_t, 1e-6, None))
            lum_r = jnp.log10(jnp.clip(lum_r, 1e-6, None))

        core = self._get_core(W, H)
        fov_tables = None
        gaze_b = None
        if gaze_mode == "tables":
            if fixation_point is None:
                fp = np.asarray([W // 2, H // 2], dtype=np.float32)
            fov_tables = core.fov_tables((float(fp[0]), float(fp[1])))
            if n_proc > 1:
                # host-replicated (numpy) so the global jit can broadcast
                # them; a committed single-device array cannot feed a
                # multi-process program
                fov_tables = jax.tree.map(np.asarray, fov_tables)
        elif gaze_mode == "per_pair":
            if fp.shape[0] != N:
                raise RuntimeError(f"fixation_point has {fp.shape[0]} rows "
                                   f"for {N} pairs")
            gaze_b = fp[:, None, :] if fp.ndim == 2 else fp
            gaze_b = np.broadcast_to(gaze_b, (N, F, 2)).astype(np.float32)
            if pad:
                gaze_b = np.concatenate(
                    [gaze_b, np.repeat(gaze_b[-1:], pad, axis=0)], axis=0)
        stats = {"width": W, "height": H, "N_frames": F, "N_pairs": N,
                 "frames_per_second": frames_per_second}
        if F == 1:
            key = ("batch", core, mesh, gaze_mode)
            if key not in self._shard_fns:
                self._shard_fns[key] = make_batch_scorer(
                    core, mesh, self.parameters,
                    defer_tables=gaze_mode == "tables",
                    use_gaze=gaze_mode == "per_pair")
            fn = self._shard_fns[key]
            # lum arrays are already sharded/global batch-axis arrays
            at, ar = lum_t[:, 0], lum_r[:, 0]
            if gaze_b is not None:
                gaze_b = gaze_b[:, 0]
                if n_proc > 1:
                    gaze_b = local_batch_to_global(mesh, P(axes, None), gaze_b)
            if gaze_mode == "tables":
                jods = fn(at, ar, fov_tables)
            elif gaze_mode == "per_pair":
                jods = fn(at, ar, gaze_b)
            else:
                jods = fn(at, ar)
            Q_pc = None
        else:
            fl = temporal_ops.filter_len_for_fps(frames_per_second)
            filt = temporal_ops.temporal_filters(
                frames_per_second, fl, self.sustained_sigma, self.sustained_beta)
            idx = jnp.asarray(temporal_ops.padding_indices(
                F, fl, self.temp_padding))
            # lum arrays are already sharded/global; take() keeps the batch
            # axis sharding
            pt = jnp.take(lum_t, idx, axis=1)
            pr = jnp.take(lum_r, idx, axis=1)
            if gaze_b is not None and n_proc > 1:
                gaze_b = local_batch_to_global(mesh, P(axes, None, None),
                                               gaze_b)
            key = ("batchvid", core, mesh, filt.tobytes(), gaze_mode)
            if key not in self._shard_fns:
                self._shard_fns[key] = make_batch_video_scorer(
                    core, filt, mesh, self.parameters,
                    defer_tables=gaze_mode == "tables",
                    use_gaze=gaze_mode == "per_pair")
            fn = self._shard_fns[key]
            if gaze_mode == "tables":
                jods, Q_pc = fn(pt, pr, fov_tables)
            elif gaze_mode == "per_pair":
                jods, Q_pc = fn(pt, pr, gaze_b)
            else:
                jods, Q_pc = fn(pt, pr)
        if n_proc > 1:
            # all-gather the (tiny) results, then keep this process's rows
            rows = local_row_positions(mesh, int(jods.shape[0]))[:N]
            jods = np.asarray(replicate_to_hosts(mesh, jods))[rows]
            if Q_pc is not None:
                stats["Q_per_ch"] = np.asarray(
                    replicate_to_hosts(mesh, Q_pc))[:, :, rows]
            stats["n_processes"] = n_proc
            return jods, stats
        if Q_pc is not None:
            stats["Q_per_ch"] = np.asarray(Q_pc)[:, :, :N]
        return np.asarray(jods)[:N], stats

    # ------------------------------------------------------------------
    # differentiable path (metric-as-loss for training)
    # ------------------------------------------------------------------
    def predict_traced(self, test_cont, reference_cont, dim_order="BCFHW",
                       frames_per_second=0, fixation_point=None):
        """Fully traced JOD prediction: differentiable end-to-end and safe to
        wrap in jax.jit / jax.grad.

        Unlike ``predict`` (which streams blocks with host orchestration),
        the whole clip is scored in one traced computation.  Inputs are
        display-encoded float arrays (or luminance when the photometry is
        absolute).  The reference achieves trainability via torch gradient
        checkpointing (pyfvvdp/fvvdp.py:302-304); here ``use_checkpoints``
        applies jax.checkpoint around the spatial core for the same
        memory/compute trade.
        """
        import jax

        from fovvideovdp_tpu.video_source import _reshuffle_dims_jnp

        x_t = _reshuffle_dims_jnp(jnp.asarray(test_cont, jnp.float32),
                                  dim_order, "BCFHW")
        x_r = _reshuffle_dims_jnp(jnp.asarray(reference_cont, jnp.float32),
                                  dim_order, "BCFHW")
        B, C, F, H, W = x_t.shape
        if B != 1:
            raise RuntimeError("predict_traced supports batch size 1; "
                               "use predict_batch for batches of pairs")
        if F > 1 and frames_per_second <= 0:
            raise RuntimeError(
                "When passing video sequences, you must set 'frames_per_second' parameter")

        colorspaces = utils.json2dict(utils.config_files.find("color_spaces.json"))
        rgb2y = colorspaces[self.color_space]["RGB2Y"]

        def to_lum(x):
            L = self.display_photometry.forward(x[0])
            if C == 3:
                L = L[0] * rgb2y[0] + L[1] * rgb2y[1] + L[2] * rgb2y[2]
            else:
                L = L[0]
            return L  # (F, H, W)

        lum_t, lum_r = to_lum(x_t), to_lum(x_r)
        if self.contrast == "log":
            lum_t = jnp.log10(jnp.clip(lum_t, 1e-6, None))
            lum_r = jnp.log10(jnp.clip(lum_r, 1e-6, None))

        core = self._get_core(W, H)
        if fixation_point is None:
            fixation_point = np.array([W // 2, H // 2])
        gaze = jnp.asarray(np.broadcast_to(
            np.asarray(fixation_point, np.float32).reshape(-1, 2)[-1:]
            if np.asarray(fixation_point).ndim == 1 else fixation_point,
            (F, 2))) if self.foveated else None

        score = core.score_frames
        if self.use_checkpoints:
            score = jax.checkpoint(score, static_argnums=(2,))

        if F == 1:
            R = jnp.stack([lum_t[0], lum_r[0]], axis=0)[None]
            Q_per_ch, _ = score(R, gaze, 1)
        else:
            fl = temporal_ops.filter_len_for_fps(frames_per_second)
            filt = jnp.asarray(temporal_ops.temporal_filters(
                frames_per_second, fl, self.sustained_sigma, self.sustained_beta))
            idx = temporal_ops.padding_indices(F, fl, self.temp_padding)
            pt = jnp.take(lum_t, jnp.asarray(idx), axis=0)
            pr = jnp.take(lum_r, jnp.asarray(idx), axis=0)
            Rt = temporal_ops.apply_temporal_filters(pt, filt)
            Rr = temporal_ops.apply_temporal_filters(pr, filt)
            R = jnp.stack([Rt[:, 0], Rr[:, 0], Rt[:, 1], Rr[:, 1]], axis=1)
            Q_per_ch, _ = score(R, gaze, 2)

        return self.do_pooling_and_jods(Q_per_ch)

    def loss(self, test_cont, reference_cont, **kwargs):
        """Differentiable training loss: 10 - Q_JOD (0 when imperceptible)."""
        return 10.0 - self.predict_traced(test_cont, reference_cont, **kwargs)

    # ------------------------------------------------------------------
    def do_pooling_and_jods(self, Q_per_ch):
        """Band/channel/frame pooling + JOD regression (fvvdp.py:337-357).

        Jitted: eagerly the chain is ~12 separate XLA programs (power,
        divide, reduce, ...), each a dispatch round-trip — on the tunnel
        transport that is 12 RPCs plus 12 sub-second compiles on a cold
        cache.  One jitted program per Q shape removes both."""
        params = (self.w_transient, self.beta_sch, self.beta_tch,
                  self.beta_t, self.jod_a, self.log_jod_exp)
        if getattr(self, "_pool_jit_key", None) != params:
            self._pool_jit_key = params
            self._pool_jit = jax.jit(
                lambda Q, _p=params: mask_ops.pool_to_jod(Q, *_p))
        return self._pool_jit(Q_per_ch)

    def get_temporal_filters(self, frames_per_s):
        """(F, omega) for API parity with the reference (fvvdp.py:609-630)."""
        fl = self.filter_len if self.filter_len > 0 \
            else temporal_ops.filter_len_for_fps(frames_per_s)
        F = temporal_ops.temporal_filters(frames_per_s, fl, self.sustained_sigma,
                                          self.sustained_beta)
        return jnp.asarray(F), jnp.asarray([0, 5])

    # ------------------------------------------------------------------
    def short_name(self):
        return "FovVideoVDP"

    def quality_unit(self):
        return "JOD"

    def get_info_string(self):
        standard_str = f", ({self.display_name})" \
            if self.display_name.startswith("standard_") else ""
        fv_mode = "foveated" if self.foveated else "non-foveated"
        return '"FovVideoVDP v{}, {:.4g} [pix/deg], Lpeak={:.5g}, Lblack={:.4g} [cd/m^2], {}{}"'.format(
            self.version, self.pix_per_deg,
            self.display_photometry.get_peak_luminance(),
            self.display_photometry.get_black_level(), fv_mode, standard_str)

    def write_features_to_json(self, stats: dict, dest_fname: str):
        """Per-band/channel/frame feature export for metric retraining
        (fvvdp.py:650-665)."""
        Q_per_ch = stats["Q_per_ch"]  # [bb, cc, ff]
        fmap = {}
        for key, value in stats.items():
            if key not in ("Q_per_ch", "heatmap"):
                fmap[key] = value.tolist() if isinstance(value, np.ndarray) else value
        for cc in range(Q_per_ch.shape[1]):
            for bb in range(Q_per_ch.shape[0]):
                fmap[f"t{cc}_b{bb}"] = Q_per_ch[bb, cc, :].tolist()
        with open(dest_fname, "w", encoding="utf-8") as f:
            json.dump(fmap, f, ensure_ascii=False, indent=4)
