"""CLI, image loading, and .yuv source tests (no ffmpeg binary required)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from fovvideovdp_tpu.io.images import load_image_as_array
from fovvideovdp_tpu.video_source_yuv import (YUVReader, decode_video_props,
                                              create_yuv_fname,
                                              fvvdp_video_source_yuv_file)

REF_MEDIA = "/root/reference/example_media"


def test_load_16bit_png():
    img = load_image_as_array(os.path.join(REF_MEDIA, "wavy_facade.png"))
    assert img.dtype == np.uint16, "16-bit PNG must not be downconverted"
    assert img.shape == (683, 1024, 3)
    assert img.max() > 255


def test_load_jpeg_and_hdr():
    img = load_image_as_array(os.path.join(REF_MEDIA, "tree.jpg"))
    assert img.dtype == np.uint8 and img.ndim == 3
    hdr = load_image_as_array(os.path.join(REF_MEDIA, "nancy_church.hdr"))
    assert hdr.dtype == np.float32 and hdr.shape[2] == 3
    assert np.isfinite(hdr).all() and hdr.max() > 1.0


def test_yuv_props_roundtrip():
    props = decode_video_props("clip_1920x1080_10b_420_2020_24fps.yuv")
    assert props == dict(width=1920, height=1080, fps=24, bit_depth=10,
                         color_space="2020", chroma_ss="420")
    assert create_yuv_fname("clip", props) == "clip_1920x1080_10b_420_2020_24fps.yuv"


@pytest.fixture
def yuv_pair(tmp_path):
    """Synthesize a small 10-bit 4:2:0 BT.2020 yuv pair."""
    rng = np.random.RandomState(0)
    H, W, F = 32, 48, 4
    names = []
    for tag in ("test", "ref"):
        fname = tmp_path / f"{tag}_{W}x{H}_10b_420_2020_30fps.yuv"
        planes = []
        for _ in range(F):
            planes.append(rng.randint(64, 940, (H, W), dtype=np.uint16))
            planes.append(rng.randint(64, 960, (H // 2, W // 2), dtype=np.uint16))
            planes.append(rng.randint(64, 960, (H // 2, W // 2), dtype=np.uint16))
        with open(fname, "wb") as f:
            for p in planes:
                f.write(p.tobytes())
        names.append(str(fname))
    return names


def test_yuv_reader(yuv_pair):
    r = YUVReader(yuv_pair[0])
    assert (r.width, r.height, r.bit_depth, r.frame_count) == (48, 32, 10, 4)
    Y, u, v = r.get_frame_yuv(0)
    assert Y.shape == (32, 48) and u.shape == (16, 24)
    rgb = np.asarray(r.get_frame_rgb(1))
    assert rgb.shape == (32, 48, 3) and (rgb >= 0).all() and (rgb <= 1).all()


def test_yuv_video_source_scoring(yuv_pair):
    from fovvideovdp_tpu import fvvdp
    vs = fvvdp_video_source_yuv_file(yuv_pair[0], yuv_pair[1],
                                     display_photometry="standard_hdr_pq")
    assert vs.get_video_size() == (32, 48, 4)
    fv = fvvdp(display_name="standard_hdr_pq")
    Q, stats = fv.predict_video_source(vs)
    assert np.isfinite(Q) and 0 <= Q <= 10


def _run_cli(args, cwd=None, n_devices=None):
    from conftest import cpu_subprocess_env
    env = cpu_subprocess_env(n_devices)
    return subprocess.run(
        [sys.executable, "-m", "fovvideovdp_tpu.run_fvvdp"] + args,
        capture_output=True, text=True, env=env, cwd=cwd or os.getcwd(),
        timeout=600)


def test_cli_list_displays():
    out = _run_cli(["--display", "?", "--verbose"])
    assert out.returncode == 0
    assert "standard_4k" in out.stderr + out.stdout


def test_cli_image_pair(tmp_path):
    import cv2
    rng = np.random.RandomState(7)
    ref = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    tst = np.clip(ref.astype(np.int16) + rng.randint(-20, 20, ref.shape), 0,
                  255).astype(np.uint8)
    ref_p, tst_p = str(tmp_path / "ref.png"), str(tmp_path / "tst.png")
    cv2.imwrite(ref_p, ref[:, :, ::-1])
    cv2.imwrite(tst_p, tst[:, :, ::-1])

    out = _run_cli(["--test", tst_p, "--ref", ref_p, "--display", "standard_fhd",
                    "--quiet", "--heatmap", "supra-threshold", "--features",
                    "--output-dir", str(tmp_path)])
    assert out.returncode == 0, out.stderr
    q = float(out.stdout.strip().splitlines()[-1])
    assert 0 <= q <= 10
    assert (tmp_path / "tst_heatmap.png").exists()
    fmap = json.loads((tmp_path / "tst_fmap.json").read_text())
    assert "t0_b0" in fmap and fmap["width"] == 64


def test_cli_pu_psnr(tmp_path):
    import cv2
    rng = np.random.RandomState(8)
    ref = (rng.rand(32, 40, 3) * 255).astype(np.uint8)
    ref_p, tst_p = str(tmp_path / "r.png"), str(tmp_path / "t.png")
    cv2.imwrite(ref_p, ref[:, :, ::-1])
    cv2.imwrite(tst_p, ref[:, :, ::-1])
    out = _run_cli(["--test", tst_p, "--ref", ref_p, "--metrics", "pu-psnr",
                    "--quiet"])
    assert out.returncode == 0, out.stderr
    # identical images -> infinite PSNR
    assert "inf" in out.stdout.lower() or float(out.stdout.strip()) > 60


def test_cli_all_devices_matches_single(yuv_pair):
    """`--all-devices` shards the streamed video over every visible device
    and must print the same JOD as the single-device run."""
    base = ["--test", yuv_pair[0], "--ref", yuv_pair[1],
            "--display", "standard_hdr_pq", "--quiet"]
    solo = _run_cli(base)
    assert solo.returncode == 0, solo.stderr
    mesh = _run_cli(base + ["--all-devices"], n_devices=4)
    assert mesh.returncode == 0, mesh.stderr
    assert abs(float(solo.stdout.strip()) - float(mesh.stdout.strip())) < 1e-3


def test_yuv_props_trailing_p():
    props = decode_video_props("clip_1280x720p_8b_420_709_30fps.yuv")
    assert (props["width"], props["height"]) == (1280, 720)
    assert props["color_space"] == "709"
