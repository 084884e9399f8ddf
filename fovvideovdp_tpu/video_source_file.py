"""File-based video/image sources.

* Images (png/jpg/exr/hdr/...) -> array source (any bit depth).
* Videos (mp4/...)            -> ffmpeg *binary* spawned with a rawvideo pipe,
  either decoding straight to RGB (ffmpeg does colour conversion,
  ``ffmpeg_cc=True``) or piping raw YUV planes that are upsampled and
  colour-converted on device (default — mirrors the reference's faster GPU
  path, pyfvvdp/video_source_file.py:163-276).  When the ffmpeg/ffprobe
  binaries are absent, decoding falls back to OpenCV's bundled FFMPEG
  (8-bit; the reference hard-requires the binaries).
* ``.yuv`` raw files          -> memory-mapped reader (video_source_yuv).

The ffmpeg subprocess is the host-side decode stage of the pipeline: it
decodes ahead while the TPU scores the previous block (same overlap the
reference gets from its pipe, video_source_file.py:111-119).
"""
from __future__ import annotations

import json
import logging
import os
import re
import shutil
import subprocess
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fovvideovdp_tpu.io import RESIZE_METHODS
from fovvideovdp_tpu.io import yuv as yuv_io
from fovvideovdp_tpu.io.images import load_image_as_array
from fovvideovdp_tpu.video_source import (fvvdp_video_source,
                                          fvvdp_video_source_array,
                                          fvvdp_video_source_dm)

IMAGE_EXTENSIONS = [".png", ".jpg", ".gif", ".bmp", ".jpeg", ".ppm", ".tiff",
                    ".dds", ".exr", ".hdr"]


def _require_ffmpeg():
    path = shutil.which("ffmpeg")
    if path is None:
        raise RuntimeError(
            "The ffmpeg binary is required to decode video files but was not "
            "found on PATH. Use image inputs, raw .yuv files, or array sources.")
    return path


def _ffprobe(vidfile: str) -> dict:
    probe_bin = shutil.which("ffprobe")
    if probe_bin is None:
        raise RuntimeError("ffprobe not found — cannot inspect video files.")
    out = subprocess.run(
        [probe_bin, "-v", "quiet", "-print_format", "json", "-show_streams",
         "-show_format", vidfile], capture_output=True)
    if out.returncode != 0:
        raise RuntimeError(f'ffmpeg failed to open file "{vidfile}"')
    return json.loads(out.stdout)


def _stream_frame_count(stream: dict, probe: dict, fps: float) -> int:
    """Frame count with fallbacks — many containers lack nb_frames (the
    reference raises KeyError there, pyfvvdp/video_source_file.py:75)."""
    if "nb_frames" in stream:
        return int(stream["nb_frames"])
    for src in (stream, probe.get("format", {})):
        dur = src.get("duration")
        if dur is not None:
            # floor, not round: over-estimating by one makes the final block
            # read fail after the whole video has been scored
            return int(float(dur) * fps)
    raise RuntimeError(
        "Cannot determine the video frame count (no nb_frames/duration "
        "metadata); pass frames=N explicitly.")


class video_reader:
    """Decode a video through an ffmpeg rawvideo pipe (RGB output).

    Parity: pyfvvdp/video_source_file.py:57-160."""

    def __init__(self, vidfile, frames=-1, resize_fn=None, resize_height=-1,
                 resize_width=-1, verbose=False):
        probe = _ffprobe(vidfile)
        stream = next(s for s in probe["streams"] if s["codec_type"] == "video")

        self.src_width = self.width = int(stream["width"])
        self.src_height = self.height = int(stream["height"])
        self.color_space = stream.get("color_space", "unknown")
        self.color_transfer = stream.get("color_transfer", "unknown")
        self.in_pix_fmt = stream["pix_fmt"]
        # avg_frame_rate = frames/duration; r_frame_rate is the container's
        # base tick rate, which over-reports for VFR/telecined streams (e.g.
        # 59.94 for 23.976 fps soft-telecine) — wrong temporal filters
        rate = stream.get("avg_frame_rate", "0/0")
        num, den = (float(x) for x in rate.split("/"))
        if num <= 0 or den <= 0:
            num, den = (float(x) for x in stream["r_frame_rate"].split("/"))
        self.avg_fps = num / den
        if frames != -1 and "nb_frames" not in stream:
            num_frames = frames  # caller-specified count, metadata optional
        else:
            num_frames = _stream_frame_count(stream, probe, self.avg_fps)
        self.frames = num_frames if frames == -1 else min(num_frames, frames)

        self._setup_ffmpeg(vidfile, resize_fn, resize_height, resize_width, verbose)
        self.curr_frame = -1

    # host-RAM budget for the native prefetch ring, per stream
    _PIPE_RING_BYTES = 128 << 20

    def _spawn(self, args):
        self.process = subprocess.Popen(args, stdout=subprocess.PIPE,
                                        bufsize=max(self.frame_bytes * 4, 1 << 20))
        self._pipe = None  # native prefetcher, created lazily on first read

    def _pipe_reader(self):
        """Native prefetching pipe drain (background thread + frame ring), so
        ffmpeg decodes ahead while the device scores the previous block — a
        kernel pipe holds ~64 KB, far less than one frame, so without the
        drain the decoder stalls whenever this process is busy.  Created on
        first read (frame_bytes is only final after subclass __init__);
        False = native runtime unavailable, use the blocking Python reads."""
        if self._pipe is None:
            try:
                from fovvideovdp_tpu.native import NativePipeReader
                ring = max(2, min(16, self._PIPE_RING_BYTES // self.frame_bytes))
                self._pipe = NativePipeReader(self.process.stdout.fileno(),
                                              self.frame_bytes, ring)
            except Exception as e:  # missing toolchain, non-POSIX, ...
                logging.debug("native pipe reader unavailable: %s", e)
                self._pipe = False
        return self._pipe

    def _setup_ffmpeg(self, vidfile, resize_fn, resize_height, resize_width, verbose):
        if any(f"p{bd}" in self.in_pix_fmt for bd in (10, 12, 14, 16)):
            out_pix_fmt, self.bpp, self.dtype = "rgb48le", 6, np.uint16
        else:
            out_pix_fmt, self.bpp, self.dtype = "rgb24", 3, np.uint8

        ffmpeg_bin = _require_ffmpeg()
        vf = []
        if resize_fn is not None and (resize_width != self.width
                                      or resize_height != self.height):
            mode = "neighbor" if resize_fn == "nearest" else resize_fn
            vf = ["-vf", f"scale={resize_width}:{resize_height}:flags={mode}"]
            self.width, self.height = resize_width, resize_height

        self.frame_bytes = self.width * self.height * self.bpp
        self._spawn([ffmpeg_bin, "-nostdin", "-loglevel",
                     "info" if verbose else "quiet", "-i", vidfile, *vf,
                     "-f", "rawvideo", "-pix_fmt", out_pix_fmt, "pipe:"])

    def get_frame(self) -> Optional[np.ndarray]:
        if self.curr_frame + 1 >= self.frames:
            return None
        pipe = self._pipe_reader()
        if pipe:
            block = pipe.read_block(1, dtype=self.dtype)
            if block.shape[0] < 1:
                return None
            self.curr_frame += 1
            return block[0]
        in_bytes = self.process.stdout.read(self.frame_bytes)
        if not in_bytes or len(in_bytes) < self.frame_bytes:
            return None
        self.curr_frame += 1
        return np.frombuffer(in_bytes, self.dtype)

    def get_frames_block(self, count: int) -> Optional[np.ndarray]:
        """Read up to ``count`` frames from the pipe in one go.

        Returns (n, frame_elems) raw values (n <= count; None at EOF).  One
        bulk read amortises the pipe syscalls, and the caller makes ONE
        host->device transfer per block instead of one per frame (through a
        slow transport the per-frame transfers serialise against compute).
        """
        want = min(count, self.frames - 1 - self.curr_frame)
        if want <= 0:
            return None
        pipe = self._pipe_reader()
        if pipe:
            block = pipe.read_block(want, dtype=self.dtype)
            if block.shape[0] == 0:
                return None
            self.curr_frame += block.shape[0]
            return block
        buf = self.process.stdout.read(want * self.frame_bytes)
        n = len(buf) // self.frame_bytes
        if n == 0:
            return None
        self.curr_frame += n
        return np.frombuffer(buf[:n * self.frame_bytes],
                             self.dtype).reshape(n, -1)

    def unpack(self, frame_np: np.ndarray) -> jnp.ndarray:
        """Raw bytes -> (H, W, 3) display-encoded RGB in [0,1] on device."""
        return self.unpack_block(frame_np.reshape(1, -1))[0]

    def unpack_block(self, frames_np: np.ndarray) -> jnp.ndarray:
        """(n, frame_elems) raw values -> (n, H, W, 3) RGB in [0,1] on device
        (one transfer for the whole block)."""
        max_value = 255.0 if self.dtype == np.uint8 else 65535.0
        x = jnp.asarray(frames_np.reshape(-1, self.height, self.width, 3))
        return x.astype(jnp.float32) / max_value

    def close(self):
        if getattr(self, "process", None) is not None:
            proc, self.process = self.process, None
            # Kill the decoder FIRST: its death closes the pipe's write end,
            # which is what unblocks the native drain thread if it is
            # mid-read; only then is joining that thread safe.
            proc.kill()
            pipe = getattr(self, "_pipe", None)
            if pipe:
                pipe.close()
                self._pipe = False
            proc.stdout.close()
            proc.wait()

    def __del__(self):
        self.close()

    def __enter__(self):
        return self

    def __exit__(self, type, value, tb):
        self.close()


class cv2_video_reader:
    """Decode a video through OpenCV's bundled FFMPEG — no external binaries.

    Fallback used when the ``ffmpeg``/``ffprobe`` executables are not on
    PATH (the reference hard-requires them, pyfvvdp/video_source_file.py:100).
    OpenCV converts every stream to 8-bit BGR on decode, so this path is
    8-bit only, and its chroma upsampling / YCbCr matrix choice can differ
    from the piped-ffmpeg paths by a fraction of a code value — expect JOD
    drift of ~0.01 vs those paths, well inside the reference's own
    MATLAB<->Python tolerance.  Interface mirrors :class:`video_reader`.
    """

    def __init__(self, vidfile, frames=-1, resize_fn=None, resize_height=-1,
                 resize_width=-1, verbose=False):
        try:
            import cv2
        except ImportError as e:
            raise RuntimeError(
                "Decoding video files needs either the ffmpeg binary on PATH "
                "or the opencv-python package; neither is available.") from e
        self._cap = cv2.VideoCapture(vidfile)
        if not self._cap.isOpened():
            raise RuntimeError(f'OpenCV failed to open file "{vidfile}"')
        self.src_width = self.width = \
            int(self._cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        self.src_height = self.height = \
            int(self._cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        # OpenCV exposes no colour metadata; sources treat unknown as sRGB
        self.color_space = "unknown"
        self.color_transfer = "unknown"
        self.in_pix_fmt = "unknown"
        self.dtype = np.uint8
        self.avg_fps = float(self._cap.get(cv2.CAP_PROP_FPS))
        if self.avg_fps <= 0:
            raise RuntimeError(
                f'Cannot determine the frame rate of "{vidfile}"')
        num_frames = int(self._cap.get(cv2.CAP_PROP_FRAME_COUNT))
        if num_frames <= 0:
            if frames == -1:
                raise RuntimeError(
                    f'Cannot determine the frame count of "{vidfile}"; '
                    f"pass frames=N explicitly.")
            num_frames = frames
        self.frames = num_frames if frames == -1 else min(num_frames, frames)

        if resize_fn is not None and (resize_width != self.width
                                      or resize_height != self.height):
            # resize on device in unpack_block, like the YUV-device path
            self.resize_fn = resize_fn
            self.resize_height = resize_height
            self.resize_width = resize_width
        self.curr_frame = -1
        self._last_row = None
        self._eof_pad_left = self._EOF_PAD_MAX

    # CAP_PROP_FRAME_COUNT is an estimate (duration x fps for containers
    # without an index) and can over-report; tolerate a few phantom tail
    # frames by repeating the last decoded frame — the same hardening the
    # ffmpeg path has for duration-derived counts (_stream_frame_count).
    _EOF_PAD_MAX = 4

    def get_frame(self) -> Optional[np.ndarray]:
        block = self.get_frames_block(1)
        return None if block is None else block[0]

    def get_frames_block(self, count: int) -> Optional[np.ndarray]:
        """Read up to ``count`` frames; (n, H*W*3) uint8 RGB rows (None at
        EOF), matching :meth:`video_reader.get_frames_block`."""
        want = min(count, self.frames - 1 - self.curr_frame)
        if want <= 0:
            return None
        rows = []
        while len(rows) < want:
            ok, bgr = self._cap.read()
            if not ok:
                last = rows[-1] if rows else self._last_row
                missing = self.frames - 1 - self.curr_frame - len(rows)
                if last is None or missing > self._eof_pad_left:
                    break  # too short to paper over: surface the hard error
                n_pad = want - len(rows)
                logging.warning(
                    "video ended short of its metadata frame count; "
                    "repeating the last decoded frame %d time(s)", n_pad)
                self._eof_pad_left -= n_pad
                rows.extend([last] * n_pad)
                break
            rows.append(np.ascontiguousarray(bgr[:, :, ::-1]).reshape(-1))
        if not rows:
            return None
        self._last_row = rows[-1]
        self.curr_frame += len(rows)
        return np.stack(rows)

    def unpack(self, frame_np: np.ndarray) -> jnp.ndarray:
        return self.unpack_block(frame_np.reshape(1, -1))[0]

    def unpack_block(self, frames_np: np.ndarray) -> jnp.ndarray:
        """(n, H*W*3) uint8 RGB -> (n, H, W, 3) in [0,1] on device (one
        transfer per block), with the optional full-screen resize."""
        n = frames_np.shape[0]
        x = jnp.asarray(frames_np.reshape(n, self.height, self.width, 3))
        RGB = x.astype(jnp.float32) / 255.0
        if getattr(self, "resize_fn", None) is not None:
            RGB = jnp.clip(jax.image.resize(
                RGB, (n, self.resize_height, self.resize_width, 3),
                method=RESIZE_METHODS[self.resize_fn]), 0.0, 1.0)
        return RGB

    def close(self):
        cap, self._cap = getattr(self, "_cap", None), None
        if cap is not None:
            cap.release()

    def __del__(self):
        self.close()

    def __enter__(self):
        return self

    def __exit__(self, type, value, tb):
        self.close()


class video_reader_yuv_device(video_reader):
    """Pipe raw YUV planes; chroma upsampling + YCbCr->RGB run on device.

    Parity: pyfvvdp/video_source_file.py:166-276 (its 'pytorch' GPU path)."""

    def __init__(self, vidfile, frames=-1, resize_fn=None, resize_height=-1,
                 resize_width=-1, verbose=False):
        super().__init__(vidfile, frames, resize_fn, resize_height,
                         resize_width, verbose)
        self.y_pixels = self.width * self.height
        self.y_shape = (self.height, self.width)
        if self.chroma_ss == "444":
            self.frame_bytes = self.y_pixels * 3
            self.uv_pixels = self.y_pixels
            self.uv_shape = self.y_shape
        elif self.chroma_ss == "420":
            self.frame_bytes = self.y_pixels * 3 // 2
            self.uv_pixels = self.y_pixels // 4
            self.uv_shape = (self.height // 2, self.width // 2)
        else:
            raise RuntimeError("Unrecognized chroma subsampling.")
        if self.bit_depth > 8:
            self.frame_bytes *= 2

    def _setup_ffmpeg(self, vidfile, resize_fn, resize_height, resize_width, verbose):
        m = re.search(r"p(\d+)", self.in_pix_fmt)
        self.bit_depth = 8 if m is None else int(m.group(1))
        # search, not a fixed slice: full-range 'yuvj420p' and alpha
        # 'yuva420p' formats put the subsampling digits at varying offsets
        m_ss = re.search(r"(444|422|420)", self.in_pix_fmt)
        self.chroma_ss = m_ss.group(1) if m_ss else self.in_pix_fmt
        if self.chroma_ss not in ("444", "420"):
            raise RuntimeError(
                f"Unsupported chroma subsampling in pix_fmt "
                f"'{self.in_pix_fmt}' (device path handles 420/444; pass "
                f"ffmpeg_cc=True / --ffmpeg-cc to convert in ffmpeg)")

        if self.bit_depth > 8:
            self.dtype = np.uint16
            out_pix_fmt = f"yuv{self.chroma_ss}p{self.bit_depth}le"
        else:
            self.dtype = np.uint8
            out_pix_fmt = f"yuv{self.chroma_ss}p"

        if resize_fn is not None:  # resize later on device
            self.resize_fn = resize_fn
            self.resize_height = resize_height
            self.resize_width = resize_width

        self.frame_bytes = self.width * self.height * 3  # adjusted in __init__
        ffmpeg_bin = _require_ffmpeg()
        self._spawn([ffmpeg_bin, "-nostdin", "-loglevel",
                     "info" if verbose else "quiet", "-i", vidfile,
                     "-f", "rawvideo", "-pix_fmt", out_pix_fmt, "pipe:"])

    def unpack(self, x: np.ndarray) -> jnp.ndarray:
        return self.unpack_block(x.reshape(1, -1))[0]

    def unpack_block(self, x: np.ndarray) -> jnp.ndarray:
        """(n, frame_elems) planar YUV -> (n, H, W, 3) RGB on device; chroma
        upsampling + colour conversion (+ optional full-screen resize) run
        batched on device after ONE transfer per block."""
        n = x.shape[0]
        Y = jnp.asarray(x[:, :self.y_pixels]).reshape((n,) + self.y_shape)
        u = jnp.asarray(x[:, self.y_pixels:self.y_pixels + self.uv_pixels]
                        ).reshape((n,) + self.uv_shape)
        v = jnp.asarray(x[:, self.y_pixels + self.uv_pixels:]
                        ).reshape((n,) + self.uv_shape)
        to_rgb = lambda yy, uu, vv: yuv_io.yuv_to_rgb(  # noqa: E731
            yy, uu, vv, self.bit_depth, self.chroma_ss,
            bt2020=(self.color_space == "bt2020nc"))
        RGB = jax.vmap(to_rgb)(Y, u, v)  # (n, H, W, 3)
        if getattr(self, "resize_fn", None) is not None and \
                (self.height != self.resize_height or self.width != self.resize_width):
            method = RESIZE_METHODS[self.resize_fn]
            RGB = jax.image.resize(
                RGB, (n, self.resize_height, self.resize_width, 3),
                method=method)
        return jnp.clip(RGB, 0.0, 1.0)


class fvvdp_video_source_video_file(fvvdp_video_source_dm):
    """Frame streaming from two video files through ffmpeg pipes.

    Parity: pyfvvdp/video_source_file.py:282-372."""

    def __init__(self, test_fname, reference_fname, display_photometry="sdr_4k_30",
                 color_space_name="auto", frames=-1, full_screen_resize=None,
                 resize_resolution=None, ffmpeg_cc=False, verbose=False):
        fs_width = -1 if full_screen_resize is None else resize_resolution[0]
        fs_height = -1 if full_screen_resize is None else resize_resolution[1]
        if shutil.which("ffmpeg") is None or shutil.which("ffprobe") is None:
            # no external binaries: decode through OpenCV's bundled FFMPEG
            logging.info("ffmpeg/ffprobe not found on PATH; decoding video "
                         "files through OpenCV (8-bit)")
            reader = cv2_video_reader
        else:
            reader = video_reader if ffmpeg_cc else video_reader_yuv_device
        self.reference_vidr = reader(reference_fname, frames,
                                     resize_fn=full_screen_resize,
                                     resize_width=fs_width, resize_height=fs_height,
                                     verbose=verbose)
        self.test_vidr = reader(test_fname, frames, resize_fn=full_screen_resize,
                                resize_width=fs_width, resize_height=fs_height,
                                verbose=verbose)
        self.frames = self.test_vidr.frames if frames == -1 \
            else min(frames, self.test_vidr.frames)

        if color_space_name == "auto":
            color_space_name = "BT.2020" \
                if self.test_vidr.color_space == "bt2020nc" else "sRGB"
        super().__init__(display_photometry=display_photometry,
                         color_space_name=color_space_name)

        if isinstance(self.test_vidr, cv2_video_reader) \
                and getattr(self.dm_photometry, "EOTF", None) == "PQ":
            # OpenCV decodes everything to 8-bit SDR and exposes no colour
            # metadata, so an HDR clip would be silently tone-crushed and
            # scored as sRGB — refuse rather than return a wrong JOD.
            raise RuntimeError(
                "The OpenCV decode fallback is 8-bit SDR only and cannot "
                "feed a PQ/HDR display model; install the ffmpeg binary or "
                "use raw .yuv input for HDR video files.")
        if self.test_vidr.color_transfer == "smpte2084" \
                and getattr(self.dm_photometry, "EOTF", None) != "PQ":
            logging.warning(
                f"Video color transfer function ({self.test_vidr.color_transfer}) "
                f"inconsistent with EOTF of the display model")

    def get_video_size(self):
        vr = self.test_vidr
        if getattr(vr, "resize_fn", None) is not None:
            return (vr.resize_height, vr.resize_width, self.frames)
        return (vr.height, vr.width, self.frames)

    def get_frames_per_second(self):
        return self.test_vidr.avg_fps

    def supports_random_access(self):
        return False  # strictly sequential ffmpeg pipes (preload overrides)

    def _rgb_to_luminance(self, RGB_hwc: jnp.ndarray) -> jnp.ndarray:
        frame = RGB_hwc.transpose(2, 0, 1)[None]  # (1, C, H, W)
        L = self._luminance_fn()(frame)
        return L  # (1, H, W)

    def _rgb_block_to_luminance(self, RGB_nhwc: jnp.ndarray) -> jnp.ndarray:
        return self._luminance_fn()(RGB_nhwc.transpose(0, 3, 1, 2))  # (n, H, W)

    def _next_frame(self, vid_reader, frame):
        if frame != vid_reader.curr_frame + 1:
            raise RuntimeError(
                "Video can be currently only read frame-by-frame. "
                "Random access not implemented (use preload).")
        frame_np = vid_reader.get_frame()
        if frame_np is None:
            raise RuntimeError(f"Could not read frame {frame}")
        return self._rgb_to_luminance(vid_reader.unpack(frame_np))

    def _next_block(self, vid_reader, start, count):
        if start != vid_reader.curr_frame + 1:
            raise RuntimeError(
                "Video can be currently only read frame-by-frame. "
                "Random access not implemented (use preload).")
        block_np = vid_reader.get_frames_block(count)
        if block_np is None or block_np.shape[0] < count:
            got = 0 if block_np is None else block_np.shape[0]
            raise RuntimeError(
                f"Could not read frames {start}..{start + count - 1} "
                f"(got {got})")
        return self._rgb_block_to_luminance(vid_reader.unpack_block(block_np))

    def get_test_frame(self, frame, device=None):
        return self._next_frame(self.test_vidr, frame)[None, None]

    def get_reference_frame(self, frame, device=None):
        return self._next_frame(self.reference_vidr, frame)[None, None]

    def get_luminance_block(self, start, count):
        cached = getattr(self, "_cached_frame0", None)
        if start == 0 and cached is not None:
            # frame 0 was already pulled off the stream for the replicate
            # warm-up; splice the cached copy in front of the live stream
            t0, r0 = cached
            self._cached_frame0 = None
            if count == 1:
                return t0, r0
            t = self._next_block(self.test_vidr, 1, count - 1)
            r = self._next_block(self.reference_vidr, 1, count - 1)
            return jnp.concatenate([t0, t]), jnp.concatenate([r0, r])
        t = self._next_block(self.test_vidr, start, count)
        r = self._next_block(self.reference_vidr, start, count)
        return t, r

    def get_indexed_luminance_block(self, indices):
        idx = [int(i) for i in indices]
        if not idx:
            H, W, _ = self.get_video_size()
            empty = jnp.zeros((0, H, W), dtype=jnp.float32)
            return empty, empty
        if set(idx) == {0} and self.test_vidr.curr_frame == -1:
            # 'replicate' temporal warm-up: fl-1 copies of the first frame.
            # Read it once, serve the copies, and keep it for the first
            # streaming block (which starts at frame 0 again).
            t0 = self._next_block(self.test_vidr, 0, 1)
            r0 = self._next_block(self.reference_vidr, 0, 1)
            self._cached_frame0 = (t0, r0)
            n = len(idx)
            return jnp.repeat(t0, n, axis=0), jnp.repeat(r0, n, axis=0)
        raise RuntimeError(
            "circular/pingpong temporal padding requires random access — "
            "use preload=True (fvvdp_video_source_video_file_preload)")


class fvvdp_video_source_video_file_preload(fvvdp_video_source_video_file):
    """Preloads all decoded frames into host RAM for random access
    (parity: pyfvvdp/video_source_file.py:378-408)."""

    def supports_random_access(self):
        return True

    def _ensure_loaded(self):
        if hasattr(self, "frame_array_tst"):
            return
        self.frame_array_tst = [self.test_vidr.get_frame()
                                for _ in range(self.frames)]
        self.frame_array_ref = [self.reference_vidr.get_frame()
                                for _ in range(self.frames)]
        mb = sum(f.nbytes for f in self.frame_array_tst if f is not None) * 2 / 1e6
        logging.debug(f"Preloaded {self.frames} frames (~{mb:.0f}MB host RAM)")

    def _frame_lum(self, vid_reader, arr, frame):
        frame_np = arr[frame]
        if frame_np is None:
            raise RuntimeError(f"Could not read frame {frame}")
        return self._rgb_to_luminance(vid_reader.unpack(frame_np))

    def get_test_frame(self, frame, device=None):
        self._ensure_loaded()
        return self._frame_lum(self.test_vidr, self.frame_array_tst, frame)[None, None]

    def get_reference_frame(self, frame, device=None):
        self._ensure_loaded()
        return self._frame_lum(self.reference_vidr, self.frame_array_ref, frame)[None, None]

    def _block_lum(self, vid_reader, arr, indices):
        raws = []
        for i in indices:
            if arr[i] is None:
                raise RuntimeError(f"Could not read frame {i}")
            raws.append(arr[i])
        block_np = np.stack(raws).reshape(len(raws), -1)
        return self._rgb_block_to_luminance(vid_reader.unpack_block(block_np))

    def get_luminance_block(self, start, count):
        self._ensure_loaded()
        idx = range(start, start + count)
        return (self._block_lum(self.test_vidr, self.frame_array_tst, idx),
                self._block_lum(self.reference_vidr, self.frame_array_ref, idx))

    def get_indexed_luminance_block(self, indices):
        self._ensure_loaded()
        idx = [int(i) for i in indices]
        if not idx:
            H, W, _ = self.get_video_size()
            empty = jnp.zeros((0, H, W), dtype=jnp.float32)
            return empty, empty
        return (self._block_lum(self.test_vidr, self.frame_array_tst, idx),
                self._block_lum(self.reference_vidr, self.frame_array_ref, idx))


class fvvdp_video_source_file(fvvdp_video_source):
    """Dispatch by extension: image pair, .yuv pair, or ffmpeg-decoded video
    (parity: pyfvvdp/video_source_file.py:414-443)."""

    def __init__(self, test_fname, reference_fname, display_photometry="sdr_4k_30",
                 color_space_name="auto", frames=-1, full_screen_resize=None,
                 resize_resolution=None, preload=False, ffmpeg_cc=False,
                 verbose=False):
        assert os.path.isfile(test_fname), f'File does not exists: "{test_fname}"'
        assert os.path.isfile(reference_fname), \
            f'File does not exists: "{reference_fname}"'

        test_ext = os.path.splitext(test_fname)[1].lower()
        ref_ext = os.path.splitext(reference_fname)[1].lower()

        if test_ext in IMAGE_EXTENSIONS:
            assert ref_ext in IMAGE_EXTENSIONS, \
                "Test is an image, but reference is a video"
            if color_space_name == "auto":
                color_space_name = "sRGB"
            img_test = load_image_as_array(test_fname)
            img_reference = load_image_as_array(reference_fname)
            if full_screen_resize is not None:
                logging.error("full-screen-resize not implemented for images.")
            self.vs = fvvdp_video_source_array(
                img_test, img_reference, 0, dim_order="HWC",
                display_photometry=display_photometry,
                color_space_name=color_space_name)
        elif test_ext == ".yuv":
            from fovvideovdp_tpu.video_source_yuv import fvvdp_video_source_yuv_file
            self.vs = fvvdp_video_source_yuv_file(
                test_fname, reference_fname, display_photometry=display_photometry,
                color_space_name=color_space_name, frames=frames,
                full_screen_resize=full_screen_resize,
                resize_resolution=resize_resolution, verbose=verbose)
        else:
            assert ref_ext not in IMAGE_EXTENSIONS, \
                "Test is a video, but reference is an image"
            cls = fvvdp_video_source_video_file_preload if preload \
                else fvvdp_video_source_video_file
            self.vs = cls(test_fname, reference_fname,
                          display_photometry=display_photometry,
                          color_space_name=color_space_name, frames=frames,
                          full_screen_resize=full_screen_resize,
                          resize_resolution=resize_resolution,
                          ffmpeg_cc=ffmpeg_cc, verbose=verbose)

    def get_video_size(self):
        return self.vs.get_video_size()

    def get_frames_per_second(self):
        return self.vs.get_frames_per_second()

    def supports_random_access(self):
        return self.vs.supports_random_access()

    def get_test_frame(self, frame, device=None):
        return self.vs.get_test_frame(frame, device)

    def get_reference_frame(self, frame, device=None):
        return self.vs.get_reference_frame(frame, device)

    def get_luminance_block(self, start, count):
        return self.vs.get_luminance_block(start, count)

    def get_indexed_luminance_block(self, indices):
        return self.vs.get_indexed_luminance_block(indices)
