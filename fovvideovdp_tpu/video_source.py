"""Video/image sources: supply test & reference frames as absolute-luminance
maps to the metric.

API-compatible with the reference sources (pyfvvdp/video_source.py:14-209)
but extended with a *blocked* access path — ``get_luminance_blocks`` yields
device arrays of many frames at once so the metric can batch frames through
one XLA program instead of fetching frame-by-frame.  Display-encoded ->
luminance conversion (EOTF + RGB2Y) runs on device inside a jitted converter.

Unlike the reference, uint16 input needs no int16 bit-packing tricks
(video_source.py:124-137): JAX supports uint16 natively.  Both float32 and
float16 inputs are accepted (the reference's float16 path was dead code due to
a dtype-check bug, video_source.py:184).
"""
from __future__ import annotations

import functools
from abc import ABC, abstractmethod
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fovvideovdp_tpu import utils
from fovvideovdp_tpu.display_model import fvvdp_display_photometry


def reshuffle_dims(arr: np.ndarray, in_dims: str, out_dims: str) -> np.ndarray:
    """Permute/insert singleton dims, e.g. "HWC" -> "BCFHW"
    (reference semantics: pyfvvdp/video_source.py:43-69)."""
    in_dims = in_dims.upper()
    out_dims = out_dims.upper()

    inter_dims = "".join(d for d in out_dims if d in in_dims)
    for d in in_dims:
        if d not in out_dims:
            raise RuntimeError(
                f'Dimension "{d}" missing in the target dimensions: "{out_dims}"')

    perm = [in_dims.find(d) for d in inter_dims]
    arr_p = np.transpose(arr, perm) if perm else arr

    out_sh = []
    k = 0
    for d in out_dims:
        if d in inter_dims:
            out_sh.append(arr_p.shape[k])
            k += 1
        else:
            out_sh.append(1)
    return arr_p.reshape(out_sh)


def _reshuffle_dims_jnp(arr: jnp.ndarray, in_dims: str, out_dims: str) -> jnp.ndarray:
    """Device-side version of reshuffle_dims (transpose + reshape on device,
    avoiding a strided host copy of large videos)."""
    in_dims = in_dims.upper()
    out_dims = out_dims.upper()
    inter_dims = "".join(d for d in out_dims if d in in_dims)
    perm = [in_dims.find(d) for d in inter_dims]
    arr_p = jnp.transpose(arr, perm) if perm else arr
    out_sh = []
    k = 0
    for d in out_dims:
        if d in inter_dims:
            out_sh.append(arr_p.shape[k])
            k += 1
        else:
            out_sh.append(1)
    return arr_p.reshape(out_sh)


def _decode_raw(x: jnp.ndarray) -> jnp.ndarray:
    """Raw stored pixel values -> display-encoded floats in [0, 1]."""
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 255.0
    if x.dtype == jnp.uint16:
        return x.astype(jnp.float32) / 65535.0
    if x.dtype == jnp.int16:
        # tolerate reference-style uint16-packed-in-int16 input
        return (x.astype(jnp.int32) & 0xFFFF).astype(jnp.float32) / 65535.0
    return x.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("dm", "rgb2y"))
def _frames_to_luminance(frames, dm, rgb2y):
    """(n, C, H, W) raw frames -> (n, H, W) absolute luminance."""
    return _luminance_cfirst(frames.transpose(1, 0, 2, 3), dm, rgb2y)


@functools.partial(jax.jit, static_argnames=("dm", "rgb2y"))
def _batch_to_luminance(x, dm, rgb2y):
    """(N, C, F, H, W) raw pair batches -> (N, F, H, W) absolute luminance.

    Shared jitted program across predict_batch calls with identical
    photometry (hashable static argument) — per-channel so only one
    channel's fp32 intermediate is live at a time."""
    if x.shape[1] == 3:
        L = dm.forward(_decode_raw(x[:, 0])) * rgb2y[0]
        L = L + dm.forward(_decode_raw(x[:, 1])) * rgb2y[1]
        return L + dm.forward(_decode_raw(x[:, 2])) * rgb2y[2]
    return dm.forward(_decode_raw(x[:, 0]))


def _luminance_cfirst(blk, dm, rgb2y):
    """(C, n, H, W) raw frames -> (n, H, W) absolute luminance.

    Channel-first so block slices from the device-resident (C, F, H, W)
    video need no layout change: the EOTF is elementwise and the RGB2Y
    weighted sum contracts axis 0 — per-channel, so only one channel's fp32
    intermediate is live at a time instead of a transposed full-RGB copy.
    """
    if blk.shape[0] == 3:
        L = dm.forward(_decode_raw(blk[0])) * rgb2y[0]
        L = L + dm.forward(_decode_raw(blk[1])) * rgb2y[1]
        return L + dm.forward(_decode_raw(blk[2])) * rgb2y[2]
    return dm.forward(_decode_raw(blk[0]))


@functools.partial(jax.jit, static_argnames=("count", "dm", "rgb2y"))
def _slice_block_luminance(video, start, count, dm, rgb2y):
    """Device-resident (C, F, H, W) video -> (count, H, W) luminance block."""
    C = video.shape[0]
    blk = jax.lax.dynamic_slice(video, (0, start, 0, 0),
                                (C, count) + video.shape[2:])
    return _luminance_cfirst(blk, dm, rgb2y)


@functools.partial(jax.jit, static_argnames=("count", "dm", "rgb2y"))
def _slice_block_luminance_pair(t_video, r_video, start, count, dm, rgb2y):
    """Both streams in ONE compiled call — on transports where every
    dispatch is a round-trip this halves the per-block source latency."""
    return (_slice_block_luminance.__wrapped__(t_video, start, count, dm, rgb2y),
            _slice_block_luminance.__wrapped__(r_video, start, count, dm, rgb2y))


@functools.partial(jax.jit, static_argnames=("dm", "rgb2y"))
def _gather_block_luminance(video, idx, dm, rgb2y):
    blk = jnp.take(video, idx, axis=1)  # (C, n, H, W)
    return _luminance_cfirst(blk, dm, rgb2y)


_UPLOAD_CHUNK_BYTES = 16 << 20


@functools.partial(jax.jit, static_argnames=("in_dims", "shape"))
def _assemble_cfhw(flat, in_dims, shape):
    return _reshuffle_dims_jnp(flat.reshape(shape), in_dims, "BCFHW")[0]


def _upload_as_cfhw(raw: np.ndarray, in_dims: str) -> jnp.ndarray:
    """Raw host array in any dim order -> device (C, F, H, W).

    The transfer goes up in ~16MB chunks: some transports degrade badly on
    large single transfers, and chunking also overlaps host paging with the
    copy.  Reassembly + dim reshuffle happen on device.  Chunks are cut on
    element boundaries in the array's own dtype — a flat uint8 view with a
    device-side bitcast compiles to a u32[N,4] intermediate whose minor dim
    TPU tiling pads 4 -> 128, a 32x HBM blow-up on multi-byte dtypes.
    """
    if isinstance(raw, jax.Array) and not isinstance(raw, np.ndarray):
        # already device-resident: reshuffle in place, no transfer at all
        return _assemble_cfhw(raw.reshape(-1), in_dims, raw.shape)
    flat = np.ascontiguousarray(raw).reshape(-1)
    chunk = max(1, _UPLOAD_CHUNK_BYTES // raw.dtype.itemsize)
    if flat.size <= chunk:
        parts = [jax.device_put(flat)]
    else:
        parts = [jax.device_put(flat[off:off + chunk])
                 for off in range(0, flat.size, chunk)]
    flat_dev = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    return _assemble_cfhw(flat_dev, in_dims, raw.shape)


class fvvdp_video_source(ABC):
    """Abstract source of test/reference frames in absolute cd/m^2."""

    @abstractmethod
    def get_video_size(self) -> Tuple[int, int, int]:
        """(height, width, n_frames)"""

    @abstractmethod
    def get_frames_per_second(self) -> float:
        ...

    @abstractmethod
    def get_test_frame(self, frame: int, device=None) -> jnp.ndarray:
        """Single frame as (1, 1, 1, H, W) absolute luminance."""

    @abstractmethod
    def get_reference_frame(self, frame: int, device=None) -> jnp.ndarray:
        ...

    def supports_random_access(self) -> bool:
        """Whether frames can be fetched at arbitrary positions (arrays,
        .yuv memmap, preloaded files).  Streaming pipe sources override this
        with False; checkpoint/resume and circular/pingpong padding need
        random access."""
        return True

    def luminance_is_device_resident(self) -> bool:
        """True when :meth:`get_luminance_block` is a pure device-side slice
        (no host transfer per block).  Gates the one-dispatch whole-video
        scan path: sources that decode or upload per block keep the streaming
        loop, whose pipelining exists to hide exactly that host work."""
        return False

    def device_resident_bytes(self) -> int:
        """HBM the source itself keeps resident while it is scored (raw
        preloaded frames); the scan path counts this against its memory
        budget on top of the padded luminance pair."""
        return 0

    # -- blocked access (the TPU fast path) ---------------------------------
    def get_luminance_block(self, start: int, count: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(test, reference) luminance blocks of shape (count, H, W).

        Default implementation falls back to per-frame fetches; concrete
        sources override with a batched conversion."""
        t = jnp.concatenate([self.get_test_frame(start + i)[0, 0] for i in range(count)], axis=0)
        r = jnp.concatenate([self.get_reference_frame(start + i)[0, 0] for i in range(count)], axis=0)
        return t, r

    def get_indexed_luminance_block(self, indices: np.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Like get_luminance_block but for an arbitrary frame index list
        (needed for circular/pingpong temporal warm-up)."""
        t = jnp.concatenate([self.get_test_frame(int(i))[0, 0] for i in indices], axis=0)
        r = jnp.concatenate([self.get_reference_frame(int(i))[0, 0] for i in indices], axis=0)
        return t, r


class fvvdp_video_source_dm(fvvdp_video_source):
    """Source that applies a photometric display model + RGB->Y conversion."""

    def __init__(self, display_photometry="sdr_4k_30", color_space_name="sRGB"):
        colorspaces_file = utils.config_files.find("color_spaces.json")
        colorspaces = utils.json2dict(colorspaces_file)
        if color_space_name not in colorspaces:
            raise RuntimeError(f'Unknown color space: "{color_space_name}"')
        self.color_to_luminance = colorspaces[color_space_name]["RGB2Y"]

        if isinstance(display_photometry, str):
            self.dm_photometry = fvvdp_display_photometry.load(display_photometry)
        elif isinstance(display_photometry, fvvdp_display_photometry):
            self.dm_photometry = display_photometry
        else:
            raise RuntimeError(
                "display_photometry must be a string or fvvdp_display_photometry subclass")

    def frames_to_luminance(self, frames):
        """(n, C, H, W) display-encoded frames -> (n, H, W) luminance.

        Shared jitted program across all sources with identical photometry
        (the photometry object is a hashable static argument)."""
        return _frames_to_luminance(
            frames, self.dm_photometry,
            tuple(float(c) for c in self.color_to_luminance))

    # kept for backwards compatibility with subclasses written against the
    # closure-based API
    def _luminance_fn(self):
        return self.frames_to_luminance


class fvvdp_video_source_array(fvvdp_video_source_dm):
    """Frames from numpy/JAX arrays, any dim order, uint8/uint16/int16/float.

    Parity: pyfvvdp/video_source.py:104-208.
    """

    def __init__(self, test_video, reference_video, fps, dim_order="BCFHW",
                 display_photometry="sdr_4k_30", color_space_name="sRGB"):
        super().__init__(display_photometry=display_photometry,
                         color_space_name=color_space_name)

        # device-resident input stays on device: np.asarray would pull the
        # whole video to host RAM only to re-upload the identical bytes
        is_dev = isinstance(test_video, jax.Array) \
            and not isinstance(test_video, np.ndarray)
        if not is_dev:
            test_video = np.asarray(test_video)
            reference_video = np.asarray(reference_video)

        if test_video.shape != reference_video.shape:
            raise RuntimeError(
                "Test and reference image/video tensors must be exactly the same shape")
        if len(dim_order) != test_video.ndim:
            raise RuntimeError(
                'Input tensor must have exactly as many dimensions as there are '
                'characters in the "dims" parameter')

        # Keep the raw input untouched; the dim reshuffle happens on device
        # (large-video host transposes are byte-strided and very slow).
        self._raw_test = test_video
        self._raw_ref = reference_video
        self._dim_order = dim_order

        if is_dev:
            dim_sizes = dict(zip(dim_order.upper(), test_video.shape))
            B, C, F = (dim_sizes.get(d, 1) for d in "BCF")
            H, W = dim_sizes["H"], dim_sizes["W"]
            test_video = reference_video = None  # host views built on demand
        else:
            test_video = reshuffle_dims(test_video, dim_order, "BCFHW")  # lazy view
            reference_video = reshuffle_dims(reference_video, dim_order, "BCFHW")
            B, C, F, H, W = test_video.shape
        self._bcfhw_shape = (B, C, F, H, W)
        if B != 1:
            # The reference silently scores only batch item 0
            # (pyfvvdp/fvvdp.py:260 "TODO: proper handling of batches");
            # here a batch is a first-class feature with its own SPMD entry
            # point instead of a silent truncation.
            raise RuntimeError(
                f"fvvdp_video_source_array expects batch size 1, got B={B}; "
                "score batches of pairs with fvvdp.predict_batch (sharded "
                "over the device mesh) or loop over batch items")
        if fps == 0 and F > 1:
            raise RuntimeError(
                "When passing video sequences, you must set 'frames_per_second' parameter")
        if C not in (1, 3):
            raise RuntimeError("The content must have either 1 or 3 colour channels.")

        self.fps = fps
        self.is_video = fps > 0
        self.is_color = C == 3
        self.test_video = test_video
        self.reference_video = reference_video

        # Keep the (display-encoded, typically uint8/uint16) video resident in
        # device HBM when it fits: one bulk transfer up front is far cheaper
        # than per-block transfers that serialise against compute, and the
        # slice + EOTF + RGB2Y then fuse into one on-device program per block.
        self._dev_videos = None
        self._preload_device = is_dev or (
            self._raw_test.nbytes + self._raw_ref.nbytes
            <= self.DEVICE_PRELOAD_LIMIT_BYTES)
        if self._preload_device:
            # Start the bulk host->device transfer NOW, without blocking:
            # dispatch is asynchronous, so the DMA runs while the caller goes
            # on to trace/compile its first program (on slow transports the
            # upload of a 4K/60 uint8 pair is ~25 s — previously serialized
            # AFTER the first compile).  Nothing is queued on the device yet,
            # so the transfer gets its full idle bandwidth; the first compute
            # that reads the buffers serializes on them by data dependency.
            try:
                self._dev_videos = (
                    _upload_as_cfhw(self._raw_test, self._dim_order),
                    _upload_as_cfhw(self._raw_ref, self._dim_order))
            except Exception:
                self._dev_videos = None  # fall back to the lazy upload

    DEVICE_PRELOAD_LIMIT_BYTES = 4_000_000_000

    def luminance_is_device_resident(self):
        return self._preload_device

    def device_resident_bytes(self):
        if not self._preload_device:
            return 0
        return int(self._raw_test.nbytes) + int(self._raw_ref.nbytes)

    def get_frames_per_second(self):
        return self.fps

    def get_video_size(self):
        _, _, F, H, W = self._bcfhw_shape
        return (H, W, F)

    # -- blocked path -------------------------------------------------------
    @property
    def _rgb2y(self):
        return tuple(float(c) for c in self.color_to_luminance)

    def _device_videos(self):
        if self._dev_videos is None:
            self._dev_videos = (
                _upload_as_cfhw(self._raw_test, self._dim_order),
                _upload_as_cfhw(self._raw_ref, self._dim_order))  # (C,F,H,W)
            # Complete the bulk transfer before any compute is dispatched:
            # interleaving host->device DMA with queued programs degrades the
            # transfer to a fraction of its idle bandwidth.
            jax.block_until_ready(self._dev_videos)
        return self._dev_videos

    def _ensure_host_bcfhw(self):
        """Materialise contiguous host BCFHW (fallback for videos too large
        for device HBM)."""
        if self.test_video is None:  # device-resident input, host view needed
            self.test_video = reshuffle_dims(
                np.asarray(self._raw_test), self._dim_order, "BCFHW")
            self.reference_video = reshuffle_dims(
                np.asarray(self._raw_ref), self._dim_order, "BCFHW")
        if not self.test_video.flags["C_CONTIGUOUS"]:
            self.test_video = np.ascontiguousarray(self.test_video)
            self.reference_video = np.ascontiguousarray(self.reference_video)

    def _convert(self, video: np.ndarray, indices) -> jnp.ndarray:
        raw = np.ascontiguousarray(video[0].transpose(1, 0, 2, 3)[indices])  # (n, C, H, W)
        return _frames_to_luminance(jnp.asarray(raw), self.dm_photometry,
                                    self._rgb2y)

    def get_luminance_block(self, start, count):
        if self._preload_device:
            t_dev, r_dev = self._device_videos()
            return _slice_block_luminance_pair(t_dev, r_dev, start, count,
                                               self.dm_photometry, self._rgb2y)
        self._ensure_host_bcfhw()
        sl = slice(start, start + count)
        return self._convert(self.test_video, sl), self._convert(self.reference_video, sl)

    def get_indexed_luminance_block(self, indices):
        idx = np.asarray(indices, dtype=np.int32)
        if self._preload_device:
            if idx.size == 0:
                H, W, _ = self.get_video_size()
                empty = jnp.zeros((0, H, W), dtype=jnp.float32)
                return empty, empty
            t_dev, r_dev = self._device_videos()
            jidx = jnp.asarray(idx)
            return (_gather_block_luminance(t_dev, jidx, self.dm_photometry,
                                            self._rgb2y),
                    _gather_block_luminance(r_dev, jidx, self.dm_photometry,
                                            self._rgb2y))
        self._ensure_host_bcfhw()
        return self._convert(self.test_video, idx), self._convert(self.reference_video, idx)

    # -- per-frame reference-compatible path --------------------------------
    def get_test_frame(self, frame, device=None):
        if self._preload_device:
            t_dev, _ = self._device_videos()
            return _slice_block_luminance(t_dev, frame, 1, self.dm_photometry,
                                          self._rgb2y)[None, None]
        self._ensure_host_bcfhw()
        return self._convert(self.test_video, slice(frame, frame + 1))[None, None]

    def get_reference_frame(self, frame, device=None):
        if self._preload_device:
            _, r_dev = self._device_videos()
            return _slice_block_luminance(r_dev, frame, 1, self.dm_photometry,
                                          self._rgb2y)[None, None]
        self._ensure_host_bcfhw()
        return self._convert(self.reference_video, slice(frame, frame + 1))[None, None]


class fvvdp_video_source_packed_array(fvvdp_video_source_dm):
    """Flat-packed YUV/RGB buffers with a 7-int header, for batch/IPC use.

    Header: [n_frames, h, w, bit_depth, chroma_ss, resize_h, resize_w]
    (parity: pyfvvdp/video_source.py:210-292).
    """

    def __init__(self, test_video, reference_video, fps,
                 display_photometry="sdr_4k_30", color_space_name="sRGB",
                 yuv=True, resize_mode="bilinear"):
        super().__init__(display_photometry, color_space_name)
        self.fps = fps
        self.is_video = fps > 0
        self.test_video = np.asarray(test_video)
        self.reference_video = np.asarray(reference_video)
        self.yuv = yuv
        self.color_space = color_space_name
        self.resize_mode = resize_mode

    def get_frames_per_second(self):
        return self.fps

    def get_video_size(self):
        n, h, w = map(int, (self.test_video[0], self.test_video[5], self.test_video[6]))
        # header: n, h, w, bit_depth, chroma_ss, resize_h, resize_w;
        # the displayed size is the resize target
        return h, w, n

    def get_test_frame(self, frame, device=None):
        return self._get_frame(self.test_video, frame)

    def get_reference_frame(self, frame, device=None):
        return self._get_frame(self.reference_video, frame)

    def _get_frame(self, from_array, idx):
        from fovvideovdp_tpu.io import yuv as yuv_io

        n, h, w, bit_depth, chroma_ss, resize_h, resize_w = map(int, from_array[:7])
        if self.yuv:
            y_pixels = h * w
            uv_shape = (h // 2, w // 2) if str(chroma_ss) == "420" else (h, w)
            uv_pixels = uv_shape[0] * uv_shape[1]
            fp = y_pixels + 2 * uv_pixels
            base = 7 + idx * fp
            Y = from_array[base: base + y_pixels].reshape(h, w)
            u = from_array[base + y_pixels: base + y_pixels + uv_pixels].reshape(uv_shape)
            v = from_array[base + y_pixels + uv_pixels: base + fp].reshape(uv_shape)
            RGB = yuv_io.yuv_to_rgb(jnp.asarray(Y), jnp.asarray(u), jnp.asarray(v),
                                    bit_depth, str(chroma_ss),
                                    bt2020=(self.color_space == "bt2020nc"))
            RGB = jnp.clip(RGB, 0, 1)
            if (resize_h != h) or (resize_w != w):
                RGB = jax.image.resize(RGB, (resize_h, resize_w, 3),
                                       method=self.resize_mode)
            frame = RGB.transpose(2, 0, 1)[None]  # (1, C, H, W)
        else:
            fp = resize_h * resize_w * 3
            raw = from_array[7 + idx * fp: 7 + (idx + 1) * fp]
            # packed RGB is full-range in its container dtype (the header's
            # bit_depth applies to the YUV layout only) — reference contract,
            # pyfvvdp/video_source.py:275-281
            max_value = 255.0 if from_array.dtype == np.uint8 else 65535.0
            frame = jnp.asarray(raw.reshape(resize_h, resize_w, 3),
                                dtype=jnp.float32) / max_value
            frame = frame.transpose(2, 0, 1)[None]

        L = self.dm_photometry.forward(frame)
        if L.shape[1] == 3:
            c = self.color_to_luminance
            L = L[:, 0] * c[0] + L[:, 1] * c[1] + L[:, 2] * c[2]
        else:
            L = L[:, 0]
        return L[None, None]  # (1, 1, 1, H, W)
