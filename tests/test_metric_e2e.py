"""End-to-end JOD parity tests vs the reference implementation.

Acceptance: |delta JOD| <= 0.01 against the PyTorch reference on identical
inputs (BASELINE.md north star), plus per-band Q_per_ch agreement.
"""
import numpy as np
import pytest

from fovvideovdp_tpu import fvvdp
from fovvideovdp_tpu.display_model import (fvvdp_display_photo_absolute,
                                           fvvdp_display_geometry)

JOD_TOL = 0.01


def assert_q_per_ch_close(ours, ref, rtol=2e-3, atol=2e-4):
    np.testing.assert_allclose(ours, ref, rtol=rtol, atol=atol)


def test_image_uint8(goldens):
    g = goldens("image_path_uint8")
    fv = fvvdp(display_name="standard_4k", heatmap="raw")
    Q, stats = fv.predict(g["test"], g["ref"], dim_order="HWC")
    assert abs(Q - float(g["Q_jod"])) <= JOD_TOL
    assert_q_per_ch_close(stats["Q_per_ch"], g["Q_per_ch"])
    np.testing.assert_allclose(stats["rho_band"], g["rho_band"], rtol=1e-6)
    # raw heatmap parity (fp16, tolerate small numeric noise)
    np.testing.assert_allclose(stats["heatmap"].astype(np.float32),
                               g["heatmap"], atol=2e-3)


def test_image_heatmap_threshold(goldens):
    g = goldens("image_path_heatmap_threshold")
    g8 = goldens("image_path_uint8")
    fv = fvvdp(display_name="standard_4k", heatmap="threshold")
    Q, stats = fv.predict(g8["test"], g8["ref"], dim_order="HWC")
    assert abs(Q - float(g["Q_jod"])) <= JOD_TOL
    np.testing.assert_allclose(stats["heatmap"].astype(np.float32),
                               g["heatmap"], atol=5e-3)


def test_image_uint16(goldens):
    g = goldens("image_path_uint16")
    fv = fvvdp(display_name="standard_4k")
    Q, stats = fv.predict(g["test"], g["ref"], dim_order="HWC")
    assert abs(Q - float(g["Q_jod"])) <= JOD_TOL
    assert_q_per_ch_close(stats["Q_per_ch"], g["Q_per_ch"])


def test_image_gray_float(goldens):
    g = goldens("image_path_gray_float")
    fv = fvvdp(display_name="standard_4k")
    Q, stats = fv.predict(g["test"], g["ref"], dim_order="HW")
    assert abs(Q - float(g["Q_jod"])) <= JOD_TOL


def test_image_hdr_absolute(goldens):
    g = goldens("image_path_hdr_abs")
    fv = fvvdp(display_photometry=fvvdp_display_photo_absolute(L_max=4000),
               display_geometry=fvvdp_display_geometry.load("standard_hdr_linear"))
    Q, stats = fv.predict(g["test"], g["ref"], dim_order="HW")
    assert abs(Q - float(g["Q_jod"])) <= JOD_TOL


@pytest.mark.parametrize("padding", ["replicate", "circular", "pingpong"])
def test_video_padding_modes(goldens, padding):
    g = goldens(f"video_path_{padding}")
    fv = fvvdp(display_name="standard_fhd", temp_padding=padding)
    Q, stats = fv.predict(g["test"], g["ref"], dim_order="HWCF",
                          frames_per_second=float(g["fps"]))
    assert abs(Q - float(g["Q_jod"])) <= JOD_TOL
    assert_q_per_ch_close(stats["Q_per_ch"], g["Q_per_ch"])


def test_video_small_blocks_match(goldens):
    """Blocked streaming must be invariant to the block size."""
    g = goldens("video_path_replicate")
    fv = fvvdp(display_name="standard_fhd", block_frames=3)
    Q, stats = fv.predict(g["test"], g["ref"], dim_order="HWCF",
                          frames_per_second=float(g["fps"]))
    assert abs(Q - float(g["Q_jod"])) <= JOD_TOL
    assert_q_per_ch_close(stats["Q_per_ch"], g["Q_per_ch"])


def test_video_heatmap(goldens):
    g = goldens("video_path_heatmap")
    gv = goldens("video_path_replicate")
    fv = fvvdp(display_name="standard_fhd", heatmap="raw")
    Q, stats = fv.predict(gv["test"], gv["ref"], dim_order="HWCF",
                          frames_per_second=float(gv["fps"]))
    assert abs(Q - float(g["Q_jod"])) <= JOD_TOL
    np.testing.assert_allclose(stats["heatmap"].astype(np.float32),
                               g["heatmap"], atol=2e-3)


def test_video_heatmap_device_resident(goldens):
    """device_heatmap=True keeps stats['heatmap'] in device memory with
    identical contents and layout (blocked path + image path)."""
    import jax

    g = goldens("video_path_heatmap")
    gv = goldens("video_path_replicate")
    fv = fvvdp(display_name="standard_fhd", heatmap="raw", device_heatmap=True,
               block_frames=3)  # >1 block so concatenation is exercised
    Q, stats = fv.predict(gv["test"], gv["ref"], dim_order="HWCF",
                          frames_per_second=float(gv["fps"]))
    assert isinstance(stats["heatmap"], jax.Array)
    assert abs(Q - float(g["Q_jod"])) <= JOD_TOL
    np.testing.assert_allclose(np.asarray(stats["heatmap"]).astype(np.float32),
                               g["heatmap"], atol=2e-3)

    gi = goldens("image_path_heatmap_threshold")
    g8 = goldens("image_path_uint8")
    fvi = fvvdp(display_name="standard_4k", heatmap="threshold",
                device_heatmap=True)
    _, si = fvi.predict(g8["test"], g8["ref"], dim_order="HWC")
    assert isinstance(si["heatmap"], jax.Array)
    np.testing.assert_allclose(np.asarray(si["heatmap"]).astype(np.float32),
                               gi["heatmap"], atol=5e-3)


def test_foveated_video(goldens):
    g = goldens("foveated_video")
    fv = fvvdp(display_name="htc_vive_pro", foveated=True)
    Q, stats = fv.predict(g["test"], g["ref"], dim_order="HWCF",
                          frames_per_second=30, fixation_point=g["gaze"])
    assert abs(Q - float(g["Q_jod"])) <= JOD_TOL
    assert_q_per_ch_close(stats["Q_per_ch"], g["Q_per_ch"])


def test_foveated_image(goldens):
    g = goldens("foveated_image")
    fv = fvvdp(display_name="htc_vive_pro", foveated=True)
    Q, stats = fv.predict(g["test"], g["ref"], dim_order="HWC",
                          fixation_point=np.array([5, 7]))
    assert abs(Q - float(g["Q_jod"])) <= JOD_TOL


def test_pu_psnr(goldens):
    from fovvideovdp_tpu import pu_psnr
    from fovvideovdp_tpu.display_model import fvvdp_display_photometry
    g = goldens("pu_psnr")
    pp = pu_psnr()
    pp.display_photometry = fvvdp_display_photometry.load("standard_4k")
    pp.color_space = "sRGB"
    Q, _ = pp.predict(g["test"], g["ref"], dim_order="HWC")
    np.testing.assert_allclose(Q, float(g["Q"]), atol=0.05)


def test_info_string():
    fv = fvvdp(display_name="standard_4k")
    s = fv.get_info_string()
    assert "FovVideoVDP v" in s and "pix/deg" in s
