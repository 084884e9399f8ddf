"""Memory-mapped raw ``.yuv`` video source.

Video properties are parsed from the file name
(``name_1920x1080_10b_420_2020_24fps.yuv`` — same convention as the
reference, pyfvvdp/video_source_yuv.py:6-52).  Chroma upsampling and
YCbCr->RGB conversion run on device; the reference's crash-on-construction
debug logging bug (video_source_yuv.py:266 reads attributes YUVReader never
sets) is not reproduced.
"""
from __future__ import annotations

import functools
import logging
import os
import re
import jax
import jax.numpy as jnp
import numpy as np

from fovvideovdp_tpu.io import RESIZE_METHODS
from fovvideovdp_tpu.io import yuv as yuv_io
from fovvideovdp_tpu.video_source import fvvdp_video_source_dm


def decode_video_props(fname: str) -> dict:
    """Parse video properties from a .yuv file name."""
    vprops = dict(width=1920, height=1080, fps=24, bit_depth=8,
                  color_space="2020", chroma_ss="420")
    bname = os.path.splitext(os.path.basename(fname))[0]
    res_match = re.compile(r"(\d+)x(\d+)p?")

    for field in bname.split("_"):
        m = res_match.fullmatch(field)
        if m:  # use the groups: '1920x1080p' must parse, not int('1080p')
            vprops["width"], vprops["height"] = int(m.group(1)), int(m.group(2))
            continue
        if field.endswith("fps"):
            vprops["fps"] = float(field[:-3])
        if field in ("444", "420"):
            vprops["chroma_ss"] = field
        if field in ("10", "10b"):
            vprops["bit_depth"] = 10
        if field in ("8", "8b"):
            vprops["bit_depth"] = 8
        if field in ("12", "12b"):
            vprops["bit_depth"] = 12
        if field in ("2020", "709"):
            vprops["color_space"] = field
        if field == "bt709":
            vprops["color_space"] = "709"
        if field in ("ct2020", "pq2020"):
            vprops["color_space"] = "2020"
    return vprops


def create_yuv_fname(basename: str, vprops: dict) -> str:
    """Build a property-encoding .yuv file name (inverse of
    decode_video_props)."""
    fps = vprops["fps"]
    fps = round(fps, 3) if round(fps) != fps else int(fps)
    return (f"{basename}_{vprops['width']}x{vprops['height']}_"
            f"{vprops['bit_depth']}b_{vprops['chroma_ss']}_"
            f"{vprops['color_space']}_{fps}fps.yuv")


class YUVReader:
    """Frame access to a raw .yuv file.

    Uses the native prefetching reader (fovvideovdp_tpu.native) when the
    toolchain is available — a background thread reads ahead so file I/O
    overlaps device compute — with a numpy memmap fallback."""

    def __init__(self, file_name: str):
        if not os.path.isfile(file_name):
            raise FileNotFoundError(f"File {file_name} not found")
        self.file_name = file_name
        vprops = decode_video_props(file_name)

        self.width = vprops["width"]
        self.height = vprops["height"]
        self.fps = vprops["fps"]
        self.color_space = vprops["color_space"]
        self.chroma_ss = vprops["chroma_ss"]
        self.bit_depth = vprops["bit_depth"]

        self.y_pixels = self.width * self.height
        self.y_shape = (self.height, self.width)
        if self.chroma_ss == "444":
            self.frame_pixels = self.y_pixels * 3
            self.uv_pixels = self.y_pixels
            self.uv_shape = self.y_shape
        else:
            self.frame_pixels = self.y_pixels * 3 // 2
            self.uv_pixels = self.y_pixels // 4
            self.uv_shape = (self.height // 2, self.width // 2)

        self.frame_bytes = self.frame_pixels * (2 if self.bit_depth > 8 else 1)
        self.dtype = np.uint16 if self.bit_depth > 8 else np.uint8
        self.frame_count = int(os.stat(file_name).st_size // self.frame_bytes)
        self.mm = None

        self.native = None
        try:
            from fovvideovdp_tpu.native import NativeYuvReader
            self.native = NativeYuvReader(file_name, self.width, self.height,
                                          self.bit_depth, self.chroma_ss)
        except Exception as e:  # missing toolchain -> memmap fallback
            logging.debug(f"native YUV reader unavailable ({e}); using memmap")

    # -- raw block access (flat samples per frame) ---------------------------
    def read_raw_block(self, start: int, count: int) -> np.ndarray:
        if self.native is not None:
            return self.native.read_block(start, count)
        if self.mm is None:
            self.mm = np.memmap(self.file_name, self.dtype, mode="r")
        out = np.empty((count, self.frame_pixels), dtype=self.dtype)
        for i in range(count):
            off = (start + i) * self.frame_pixels
            out[i] = self.mm[off:off + self.frame_pixels]
        return out

    def read_raw_indices(self, indices) -> np.ndarray:
        if self.native is not None:
            return self.native.read_indices(indices)
        if self.mm is None:
            self.mm = np.memmap(self.file_name, self.dtype, mode="r")
        out = np.empty((len(indices), self.frame_pixels), dtype=self.dtype)
        for i, idx in enumerate(indices):
            off = int(idx) * self.frame_pixels
            out[i] = self.mm[off:off + self.frame_pixels]
        return out

    def get_frame_count(self) -> int:
        return self.frame_count

    def _planes(self, frame_index: int):
        if frame_index < 0 or frame_index >= self.frame_count:
            raise RuntimeError("The frame index is outside the range of available frames")
        if self.mm is None:
            self.mm = np.memmap(self.file_name, self.dtype, mode="r")
        off = frame_index * self.frame_pixels
        Y = self.mm[off:off + self.y_pixels].reshape(self.y_shape)
        u = self.mm[off + self.y_pixels: off + self.y_pixels + self.uv_pixels] \
            .reshape(self.uv_shape)
        v = self.mm[off + self.y_pixels + self.uv_pixels: off + self.y_pixels
                    + 2 * self.uv_pixels].reshape(self.uv_shape)
        return Y, u, v

    def get_frame_yuv(self, frame_index: int):
        return self._planes(frame_index)

    def get_frame_rgb(self, frame_index: int) -> jnp.ndarray:
        """(H, W, 3) display-encoded RGB on device."""
        Y, u, v = self._planes(frame_index)
        RGB = yuv_io.yuv_to_rgb(jnp.asarray(np.ascontiguousarray(Y)),
                                jnp.asarray(np.ascontiguousarray(u)),
                                jnp.asarray(np.ascontiguousarray(v)),
                                self.bit_depth, self.chroma_ss,
                                bt2020=(self.color_space == "2020"))
        return jnp.clip(RGB, 0.0, 1.0)

    def __enter__(self):
        return self

    def __exit__(self, type, value, tb):
        self.mm = None


@functools.partial(jax.jit, static_argnames=(
    "w", "h", "bd", "ss", "bt2020", "resize", "rh", "rw", "dm", "rgb2y"))
def _yuv_block_to_luminance(raw, w, h, bd, ss, bt2020, resize, rh, rw, dm, rgb2y):
    """(n, frame_samples) raw fixed-point YUV -> (n, H', W') luminance, fully
    on device (chroma upsample, CSC, optional resize, EOTF, RGB2Y)."""
    y_px = w * h
    if ss == "420":
        uv_h, uv_w = h // 2, w // 2
    else:
        uv_h, uv_w = h, w
    uv_px = uv_h * uv_w
    Y = raw[:, :y_px].reshape(-1, h, w)
    u = raw[:, y_px:y_px + uv_px].reshape(-1, uv_h, uv_w)
    v = raw[:, y_px + uv_px:y_px + 2 * uv_px].reshape(-1, uv_h, uv_w)

    def one(Yf, uf, vf):
        RGB = jnp.clip(yuv_io.yuv_to_rgb(Yf, uf, vf, bd, ss, bt2020), 0.0, 1.0)
        if resize is not None and (h != rh or w != rw):
            method = RESIZE_METHODS[resize]
            RGB = jnp.clip(jax.image.resize(RGB, (rh, rw, 3), method=method),
                           0.0, 1.0)
        return RGB

    RGB = jax.vmap(one)(Y, u, v)          # (n, H', W', 3)
    L = dm.forward(RGB.transpose(0, 3, 1, 2))
    return L[:, 0] * rgb2y[0] + L[:, 1] * rgb2y[1] + L[:, 2] * rgb2y[2]


class fvvdp_video_source_yuv_file(fvvdp_video_source_dm):
    """Test/reference pair of raw .yuv files
    (parity: pyfvvdp/video_source_yuv.py:238-302)."""

    def __init__(self, test_fname, reference_fname, display_photometry="standard_4k",
                 color_space_name="auto", frames=-1, full_screen_resize=None,
                 resize_resolution=None, verbose=False):
        self.reference_vidr = YUVReader(reference_fname)
        self.test_vidr = YUVReader(test_fname)
        self.frames = self.test_vidr.frame_count if frames == -1 \
            else min(self.test_vidr.frame_count, frames)
        self.full_screen_resize = full_screen_resize
        self.resize_resolution = resize_resolution

        if color_space_name == "auto":
            color_space_name = "BT.2020" \
                if self.test_vidr.color_space == "2020" else "sRGB"
        super().__init__(display_photometry=display_photometry,
                         color_space_name=color_space_name)

        for vr, name in ((self.test_vidr, test_fname),
                         (self.reference_vidr, reference_fname)):
            logging.debug(
                f"  '{name}': [{vr.width}x{vr.height}], colorspace: "
                f"{vr.color_space}, bit depth: {vr.bit_depth}, fps: {vr.fps}, "
                f"chroma: {vr.chroma_ss}, frames: {self.frames}")

    def get_video_size(self):
        if self.full_screen_resize is not None:
            return (self.resize_resolution[1], self.resize_resolution[0], self.frames)
        return (self.test_vidr.height, self.test_vidr.width, self.frames)

    def get_frames_per_second(self):
        return self.test_vidr.fps

    def _frame_lum(self, vid_reader, frame) -> jnp.ndarray:
        RGB = vid_reader.get_frame_rgb(frame)
        if self.full_screen_resize is not None and \
                (vid_reader.height != self.resize_resolution[1]
                 or vid_reader.width != self.resize_resolution[0]):
            method = RESIZE_METHODS[self.full_screen_resize]
            RGB = jnp.clip(jax.image.resize(
                RGB, (self.resize_resolution[1], self.resize_resolution[0], 3),
                method=method), 0.0, 1.0)
        frame_bchw = RGB.transpose(2, 0, 1)[None]
        return self._luminance_fn()(frame_bchw)  # (1, H, W)

    def get_test_frame(self, frame, device=None):
        return self._frame_lum(self.test_vidr, frame)[None, None]

    def get_reference_frame(self, frame, device=None):
        return self._frame_lum(self.reference_vidr, frame)[None, None]

    def _block_args(self, vr):
        resize = self.full_screen_resize
        rh = self.resize_resolution[1] if resize is not None else vr.height
        rw = self.resize_resolution[0] if resize is not None else vr.width
        return dict(w=vr.width, h=vr.height, bd=vr.bit_depth, ss=vr.chroma_ss,
                    bt2020=(vr.color_space == "2020"), resize=resize,
                    rh=rh, rw=rw, dm=self.dm_photometry,
                    rgb2y=tuple(float(c) for c in self.color_to_luminance))

    def get_luminance_block(self, start, count):
        t = _yuv_block_to_luminance(
            jnp.asarray(self.test_vidr.read_raw_block(start, count)),
            **self._block_args(self.test_vidr))
        r = _yuv_block_to_luminance(
            jnp.asarray(self.reference_vidr.read_raw_block(start, count)),
            **self._block_args(self.reference_vidr))
        return t, r

    def get_indexed_luminance_block(self, indices):
        if len(indices) == 0:
            h, w, _ = self.get_video_size()
            empty = jnp.zeros((0, h, w), dtype=jnp.float32)
            return empty, empty
        t = _yuv_block_to_luminance(
            jnp.asarray(self.test_vidr.read_raw_indices(indices)),
            **self._block_args(self.test_vidr))
        r = _yuv_block_to_luminance(
            jnp.asarray(self.reference_vidr.read_raw_indices(indices)),
            **self._block_args(self.reference_vidr))
        return t, r
