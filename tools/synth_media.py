"""Deterministic synthetic media shared by the benchmark grid and the
reference-golden generators.

Every JOD golden this repo gates on must be reproducible through the
PyTorch reference, so the clip generators live in one place: the grid
scores a clip through fovvideovdp_tpu on the chip and the golden tool
scores the byte-identical clip through /root/reference on CPU.
"""
import os

import numpy as np

# BASELINE.json config 5: "4K HDR PQ YUV stream with full-screen-resize +
# heatmap output (video_source_yuv batch)" — content is 1080p 10-bit 4:2:0
# BT.2020 (PQ) raw video, resized to the 4K display on device.
CONFIG5_PROPS = dict(width=1920, height=1080, fps=30, bit_depth=10,
                     color_space="2020", chroma_ss="420")
CONFIG5_SEED = 20260819


def _yuv_fname(basename, p):
    return (f"{basename}_{p['width']}x{p['height']}_{p['bit_depth']}b_"
            f"{p['chroma_ss']}_{p['color_space']}_{int(p['fps'])}fps.yuv")


def write_config5_yuv_pair(out_dir, n_frames):
    """Write the deterministic config-5 test/reference .yuv pair; returns
    (test_path, ref_path).  10-bit 4:2:0 planes; the test video adds a small
    code-value perturbation to Y (the U/V planes are shared), the kind of
    distortion a lossy HDR pipeline introduces."""
    p = CONFIG5_PROPS
    w, h = p["width"], p["height"]
    n_y, n_uv = w * h, (w // 2) * (h // 2)
    rng = np.random.RandomState(CONFIG5_SEED)
    ref_path = os.path.join(out_dir, _yuv_fname("cfg5ref", p))
    tst_path = os.path.join(out_dir, _yuv_fname("cfg5tst", p))
    with open(ref_path, "wb") as fr, open(tst_path, "wb") as ft:
        for _ in range(n_frames):
            # mid-range PQ code values: keep most of the frame in a
            # displayable luminance band with sparse bright highlights
            y = rng.randint(64, 768, n_y).astype(np.uint16)
            u = rng.randint(320, 704, n_uv).astype(np.uint16)
            v = rng.randint(320, 704, n_uv).astype(np.uint16)
            fr.write(y.tobytes()); fr.write(u.tobytes()); fr.write(v.tobytes())
            yt = np.clip(y.astype(np.int32)
                         + rng.randint(-24, 24, n_y), 0, 1023).astype(np.uint16)
            ft.write(yt.tobytes()); ft.write(u.tobytes()); ft.write(v.tobytes())
    return tst_path, ref_path
