"""End-to-end coverage of the ffmpeg video-file source WITHOUT an ffmpeg
binary: stub ffmpeg/ffprobe executables on PATH feed deterministic raw
yuv420p bytes through the real subprocess + pipe + blocked-transfer +
on-device conversion machinery (the reference path these mirror is
pyfvvdp/video_source_file.py:57-276)."""
import json
import os
import stat
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

H, W, F, FPS = 48, 64, 6, 30.0


def _write_exe(path, body):
    with open(path, "w", encoding="utf-8") as f:
        f.write(f"#!{sys.executable}\n{body}")
    os.chmod(path, os.stat(path).st_mode | stat.S_IEXEC)


@pytest.fixture()
def fake_ffmpeg(tmp_path, monkeypatch):
    """ffprobe prints the sidecar <file>.probe.json; ffmpeg streams the raw
    file bytes to stdout (our 'videos' are stored as raw yuv420p planes)."""
    bindir = tmp_path / "bin"
    bindir.mkdir()
    _write_exe(bindir / "ffprobe", (
        "import sys\n"
        "print(open(sys.argv[-1] + '.probe.json').read())\n"))
    _write_exe(bindir / "ffmpeg", (
        "import sys\n"
        "path = sys.argv[sys.argv.index('-i') + 1]\n"
        "sys.stdout.buffer.write(open(path, 'rb').read())\n"))
    monkeypatch.setenv("PATH", f"{bindir}{os.pathsep}{os.environ['PATH']}")
    return tmp_path


def _make_video(tmp_path, name, seed, gray=False, probe_overrides=None):
    """Write F frames of yuv420p bytes + the ffprobe sidecar; returns path."""
    rng = np.random.RandomState(seed)
    frames = []
    planes = []
    for _ in range(F):
        Y = rng.randint(16, 236, (H, W), dtype=np.uint8)
        if gray:
            u = np.full((H // 2, W // 2), 128, dtype=np.uint8)
            v = np.full((H // 2, W // 2), 128, dtype=np.uint8)
        else:
            u = rng.randint(16, 241, (H // 2, W // 2), dtype=np.uint8)
            v = rng.randint(16, 241, (H // 2, W // 2), dtype=np.uint8)
        frames.append((Y, u, v))
        planes += [Y.tobytes(), u.tobytes(), v.tobytes()]
    path = tmp_path / f"{name}.mp4"
    path.write_bytes(b"".join(planes))
    probe = {"streams": [{"codec_type": "video", "width": W, "height": H,
                          "pix_fmt": "yuv420p", "nb_frames": str(F),
                          "r_frame_rate": "30/1"}]}
    if probe_overrides:
        probe["streams"][0].update(probe_overrides)
        for k, val in list(probe["streams"][0].items()):
            if val is None:
                del probe["streams"][0][k]
    (tmp_path / f"{name}.mp4.probe.json").write_text(json.dumps(probe))
    return str(path), frames


def _make_video_fmt(tmp_path, name, seed, pix_fmt, gray=False):
    """Raw planar video in an arbitrary pix_fmt (420/444, 8/10/12-bit) plus
    its ffprobe sidecar; returns (path, frames [(Y, u, v) int arrays])."""
    rng = np.random.RandomState(seed)
    bits = 8 if "p1" not in pix_fmt else int(pix_fmt.split("p")[1][:2])
    ss = "444" if "444" in pix_fmt else "420"
    dt = np.uint8 if bits == 8 else np.uint16
    d = 2 ** (bits - 8)
    uv_shape = (H, W) if ss == "444" else (H // 2, W // 2)
    frames, planes = [], []
    for _ in range(F):
        Y = rng.randint(16 * d, 236 * d, (H, W)).astype(dt)
        if gray:
            u = np.full(uv_shape, 128 * d, dtype=dt)
            v = np.full(uv_shape, 128 * d, dtype=dt)
        else:
            u = rng.randint(16 * d, 241 * d, uv_shape).astype(dt)
            v = rng.randint(16 * d, 241 * d, uv_shape).astype(dt)
        frames.append((Y, u, v))
        planes += [Y.tobytes(), u.tobytes(), v.tobytes()]  # LE on x86
    path = tmp_path / f"{name}.mp4"
    path.write_bytes(b"".join(planes))
    probe = {"streams": [{"codec_type": "video", "width": W, "height": H,
                          "pix_fmt": pix_fmt, "nb_frames": str(F),
                          "r_frame_rate": "30/1"}]}
    (tmp_path / f"{name}.mp4.probe.json").write_text(json.dumps(probe))
    return str(path), frames


def _host_yuv_to_rgb(Y, u, v, bits):
    """Independent host-side reference conversion (the reference's
    _fixed2float_upscale math, pyfvvdp/video_source_file.py:253-276):
    limited-range fixed-point scaling + the BT.709-path matrix."""
    d = 2.0 ** (bits - 8)
    Yf = np.clip(Y.astype(np.float64) / (d * 219.0) - 16.0 / 219.0, 0, 1)
    uf = np.clip(u.astype(np.float64) / (d * 224.0) - 128.0 / 224.0, -.5, .5)
    vf = np.clip(v.astype(np.float64) / (d * 224.0) - 128.0 / 224.0, -.5, .5)
    M = np.array([[1.0, 0.0, 1.402],
                  [1.0, -0.344136, -0.714136],
                  [1.0, 1.772, 0.0]])
    # both pipelines clip display-encoded RGB to [0, 1] (reference
    # video_source_file.py:244)
    return np.clip(np.stack([Yf, uf, vf], -1) @ M.T, 0.0, 1.0)


def test_streaming_matches_preload_and_scores(fake_ffmpeg):
    from fovvideovdp_tpu import fvvdp
    from fovvideovdp_tpu.video_source_file import fvvdp_video_source_file

    tst, _ = _make_video(fake_ffmpeg, "tst", seed=0)
    ref, _ = _make_video(fake_ffmpeg, "ref", seed=1)

    fv = fvvdp(display_name="standard_fhd")
    vs_stream = fvvdp_video_source_file(tst, ref, display_photometry="standard_fhd")
    assert vs_stream.get_video_size() == (H, W, F)
    assert vs_stream.get_frames_per_second() == FPS
    Q_stream, _ = fv.predict_video_source(vs_stream)

    vs_pre = fvvdp_video_source_file(tst, ref, display_photometry="standard_fhd",
                                     preload=True)
    Q_pre, _ = fv.predict_video_source(vs_pre)
    assert np.isfinite(Q_stream) and 0 <= Q_stream <= 10
    np.testing.assert_allclose(Q_stream, Q_pre, atol=1e-5)


def test_blocked_read_matches_per_frame(fake_ffmpeg):
    from fovvideovdp_tpu.video_source_file import fvvdp_video_source_file

    tst, _ = _make_video(fake_ffmpeg, "tst", seed=0)
    ref, _ = _make_video(fake_ffmpeg, "ref", seed=1)

    vs_blk = fvvdp_video_source_file(tst, ref, display_photometry="standard_fhd")
    t_blk, r_blk = vs_blk.get_luminance_block(0, F)
    assert t_blk.shape == (F, H, W)

    vs_pf = fvvdp_video_source_file(tst, ref, display_photometry="standard_fhd")
    t_pf = jnp.concatenate([vs_pf.get_test_frame(i)[0, 0] for i in range(F)])
    r_pf = jnp.concatenate([vs_pf.get_reference_frame(i)[0, 0] for i in range(F)])
    np.testing.assert_allclose(np.asarray(t_blk), np.asarray(t_pf), atol=1e-6)
    np.testing.assert_allclose(np.asarray(r_blk), np.asarray(r_pf), atol=1e-6)


def test_gray_yuv_matches_array_source(fake_ffmpeg):
    """Neutral-chroma YUV must equal an array source fed the same gray RGB
    (validates the on-device fixed-point conversion numerically)."""
    from fovvideovdp_tpu.video_source import fvvdp_video_source_array
    from fovvideovdp_tpu.video_source_file import fvvdp_video_source_file

    tst, frames = _make_video(fake_ffmpeg, "tst", seed=3, gray=True)
    vs = fvvdp_video_source_file(tst, tst, display_photometry="standard_fhd")
    t_blk, _ = vs.get_luminance_block(0, F)

    y_norm = np.stack([np.clip((f[0].astype(np.float32) - 16.0) / 219.0, 0, 1)
                       for f in frames])                      # (F, H, W)
    rgb = np.repeat(y_norm[..., None], 3, axis=-1)            # (F, H, W, 3)
    vs_arr = fvvdp_video_source_array(
        rgb.transpose(1, 2, 3, 0), rgb.transpose(1, 2, 3, 0), FPS,
        dim_order="HWCF", display_photometry="standard_fhd")
    t_arr, _ = vs_arr.get_luminance_block(0, F)
    np.testing.assert_allclose(np.asarray(t_blk), np.asarray(t_arr),
                               rtol=1e-4, atol=1e-4)


def test_10bit_420_reader_unpack_matches_host(fake_ffmpeg):
    """yuv420p10le pipe: the uint16 unpack + fixed-point scaling of the
    >8-bit branch must match the host-computed reference conversion (gray
    chroma so the 420 upsample is value-neutral)."""
    from fovvideovdp_tpu.video_source_file import video_reader_yuv_device

    tst, frames = _make_video_fmt(fake_ffmpeg, "tst10", seed=11,
                                  pix_fmt="yuv420p10le", gray=True)
    vr = video_reader_yuv_device(tst)
    assert vr.bit_depth == 10 and vr.dtype == np.uint16
    assert vr.frame_bytes == H * W * 3  # 1.5 planes x 2 bytes
    blk = vr.get_frames_block(F)
    assert blk.dtype == np.uint16 and blk.shape == (F, H * W * 3 // 2)
    rgb = np.asarray(vr.unpack_block(blk))
    vr.close()
    for i, (Y, u, v) in enumerate(frames):
        uu = np.full((H, W), 128 * 4, np.uint16)
        exp = _host_yuv_to_rgb(Y, uu, uu, 10)
        np.testing.assert_allclose(rgb[i], exp, atol=2e-4)


def test_444_10bit_reader_unpack_matches_host(fake_ffmpeg):
    """yuv444p10le: full-resolution chroma (no upsample) — exact per-pixel
    check of the colour conversion against the host reference."""
    from fovvideovdp_tpu.video_source_file import video_reader_yuv_device

    tst, frames = _make_video_fmt(fake_ffmpeg, "tst44410", seed=12,
                                  pix_fmt="yuv444p10le")
    vr = video_reader_yuv_device(tst)
    assert (vr.bit_depth, vr.chroma_ss) == (10, "444")
    assert vr.frame_bytes == H * W * 3 * 2
    blk = vr.get_frames_block(2)
    rgb = np.asarray(vr.unpack_block(blk))
    vr.close()
    for i in range(2):
        Y, u, v = frames[i]
        np.testing.assert_allclose(rgb[i], _host_yuv_to_rgb(Y, u, v, 10),
                                   atol=2e-4)


def test_444_8bit_reader_unpack_matches_host(fake_ffmpeg):
    from fovvideovdp_tpu.video_source_file import video_reader_yuv_device

    tst, frames = _make_video_fmt(fake_ffmpeg, "tst444", seed=13,
                                  pix_fmt="yuv444p")
    vr = video_reader_yuv_device(tst)
    assert (vr.bit_depth, vr.chroma_ss, vr.dtype) == (8, "444", np.uint8)
    blk = vr.get_frames_block(2)
    rgb = np.asarray(vr.unpack_block(blk))
    vr.close()
    Y, u, v = frames[0]
    np.testing.assert_allclose(rgb[0], _host_yuv_to_rgb(Y, u, v, 8),
                               atol=2e-4)


def test_10bit_end_to_end_scoring(fake_ffmpeg):
    """A 10-bit pipe source streams through the whole metric (HDR PQ display
    is the typical pairing for >8-bit content)."""
    from fovvideovdp_tpu import fvvdp
    from fovvideovdp_tpu.video_source_file import fvvdp_video_source_file

    tst, _ = _make_video_fmt(fake_ffmpeg, "tst10e", seed=14,
                             pix_fmt="yuv420p10le")
    ref, _ = _make_video_fmt(fake_ffmpeg, "ref10e", seed=15,
                             pix_fmt="yuv420p10le")
    fv = fvvdp(display_name="standard_hdr_pq")
    vs = fvvdp_video_source_file(tst, ref,
                                 display_photometry="standard_hdr_pq")
    Q, _ = fv.predict_video_source(vs)
    assert np.isfinite(Q) and 0 <= Q <= 10


def test_nb_frames_fallback_from_duration(fake_ffmpeg):
    from fovvideovdp_tpu.video_source_file import video_reader_yuv_device

    tst, _ = _make_video(fake_ffmpeg, "tst", seed=0,
                         probe_overrides={"nb_frames": None,
                                          "duration": str(F / FPS)})
    vr = video_reader_yuv_device(tst)
    assert vr.frames == F
    vr.close()


def test_no_metadata_requires_frames_arg(fake_ffmpeg):
    from fovvideovdp_tpu.video_source_file import video_reader_yuv_device

    tst, _ = _make_video(fake_ffmpeg, "tst", seed=0,
                         probe_overrides={"nb_frames": None})
    with pytest.raises(RuntimeError, match="frame count"):
        video_reader_yuv_device(tst)
    vr = video_reader_yuv_device(tst, frames=F)  # explicit count works
    assert vr.frames == F
    vr.close()


def test_cli_video_end_to_end(fake_ffmpeg):
    tst, _ = _make_video(fake_ffmpeg, "tst", seed=0)
    ref, _ = _make_video(fake_ffmpeg, "ref", seed=1)
    from conftest import cpu_subprocess_env
    env = cpu_subprocess_env()
    out = subprocess.run(
        [sys.executable, "-m", "fovvideovdp_tpu.run_fvvdp", "--test", tst,
         "--ref", ref, "--display", "standard_fhd", "--quiet"],
        capture_output=True, text=True, env=env, timeout=500)
    assert out.returncode == 0, out.stderr[-2000:]
    jod = float(out.stdout.strip().split()[-1])
    assert 0 <= jod <= 10


def test_vfr_uses_avg_frame_rate(fake_ffmpeg):
    """avg_frame_rate (frames/duration) beats r_frame_rate (container tick
    rate, over-reports for VFR/telecine) — wrong fps means wrong temporal
    filters."""
    from fovvideovdp_tpu.video_source_file import video_reader_yuv_device
    tst, _ = _make_video(fake_ffmpeg, "tst", seed=0, probe_overrides={
        "avg_frame_rate": "24000/1001", "r_frame_rate": "60000/1001"})
    vr = video_reader_yuv_device(tst)
    assert abs(vr.avg_fps - 23.976) < 0.01
    vr.close()
    # missing/zero avg_frame_rate falls back to r_frame_rate
    tst2, _ = _make_video(fake_ffmpeg, "tst2", seed=0, probe_overrides={
        "avg_frame_rate": "0/0"})
    vr2 = video_reader_yuv_device(tst2)
    assert vr2.avg_fps == 30.0
    vr2.close()


def test_full_range_pix_fmt(fake_ffmpeg):
    """'yuvj420p' (full-range, MJPEG-style) must parse as 420 subsampling —
    a fixed [3:6] slice used to see 'j42' and abort."""
    from fovvideovdp_tpu.video_source_file import video_reader_yuv_device
    tst, _ = _make_video(fake_ffmpeg, "tst", seed=0,
                         probe_overrides={"pix_fmt": "yuvj420p"})
    vr = video_reader_yuv_device(tst)
    assert vr.chroma_ss == "420"
    assert vr.get_frame() is not None
    vr.close()


def test_checkpoint_needs_random_access(fake_ffmpeg):
    """A strictly-sequential pipe source cannot resume mid-video: asking for
    checkpointing on it must raise (the CLI forces preload instead)."""
    from fovvideovdp_tpu import fvvdp
    from fovvideovdp_tpu.video_source_file import fvvdp_video_source_file

    tst, _ = _make_video(fake_ffmpeg, "tst", seed=0)
    ref, _ = _make_video(fake_ffmpeg, "ref", seed=1)
    fv = fvvdp(display_name="standard_fhd")

    vs = fvvdp_video_source_file(tst, ref, display_photometry="standard_fhd")
    with pytest.raises(RuntimeError, match="random-access"):
        fv.predict_video_source(vs, checkpoint_path="/tmp/never-written.ckpt")

    vs_pre = fvvdp_video_source_file(tst, ref, display_photometry="standard_fhd",
                                     preload=True)
    ckpt = os.path.join(fake_ffmpeg, "s.ckpt")
    Q, _ = fv.predict_video_source(vs_pre, checkpoint_path=ckpt)
    assert np.isfinite(Q) and not os.path.isfile(ckpt)
