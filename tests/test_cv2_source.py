"""OpenCV-fallback video file decoding (no ffmpeg binaries required).

The reference hard-requires the ffmpeg/ffprobe executables for video files
(pyfvvdp/video_source_file.py:100); here `fvvdp_video_source_file` falls
back to OpenCV's bundled FFMPEG when they are absent, which also lets the
published ferris-wheel aliasing goldens (reference README.md:103-111) be
validated end-to-end in this environment.
"""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

MEDIA = os.environ.get(
    "FVVDP_MEDIA", "/root/reference/example_media")
ALIASING = os.path.join(MEDIA, "aliasing")
REF = os.path.join(ALIASING, "ferris-ref.mp4")
TST = os.path.join(ALIASING, "ferris-bicubic-bicubic.mp4")

needs_media = pytest.mark.skipif(
    not os.path.isfile(REF), reason="reference example media not present")


@needs_media
def test_cv2_reader_props_and_eof():
    from fovvideovdp_tpu.video_source_file import cv2_video_reader
    with cv2_video_reader(REF, frames=5) as r:
        assert (r.width, r.height) == (1280, 720)
        assert r.avg_fps == pytest.approx(25.0)
        assert r.frames == 5
        b = r.get_frames_block(3)
        assert b.shape == (3, 1280 * 720 * 3) and b.dtype == np.uint8
        # the frame cap truncates the stream, then EOF is sticky
        b2 = r.get_frames_block(10)
        assert b2.shape[0] == 2
        assert r.get_frames_block(1) is None
        assert r.get_frame() is None


def _grab(path, n):
    cap = cv2.VideoCapture(path)
    frames = []
    for _ in range(n):
        ok, bgr = cap.read()
        assert ok
        frames.append(bgr[:, :, ::-1])
    cap.release()
    return np.stack(frames)  # (n, H, W, 3) uint8 RGB


@needs_media
def test_cv2_file_source_matches_array_path():
    """Scoring through the file source == scoring the same decoded frames
    through the array source (the file path adds no numerics of its own)."""
    from fovvideovdp_tpu import fvvdp
    from fovvideovdp_tpu.video_source_file import fvvdp_video_source_file

    n = 6
    fv = fvvdp(display_name="standard_fhd")
    vs = fvvdp_video_source_file(TST, REF, display_photometry="standard_fhd",
                                 frames=n)
    assert vs.get_video_size() == (720, 1280, n)
    assert vs.get_frames_per_second() == pytest.approx(25.0)
    Q_file, _ = fv.predict_video_source(vs)

    Q_arr, _ = fv.predict(_grab(TST, n), _grab(REF, n), dim_order="FHWC",
                          frames_per_second=25.0)
    assert Q_file == pytest.approx(Q_arr, abs=2e-3)


@needs_media
def test_cv2_source_full_screen_resize():
    from fovvideovdp_tpu.video_source_file import fvvdp_video_source_file
    vs = fvvdp_video_source_file(TST, REF, display_photometry="standard_fhd",
                                 frames=3, full_screen_resize="bilinear",
                                 resize_resolution=(640, 360))
    assert vs.get_video_size() == (360, 640, 3)
    t, r = vs.get_luminance_block(0, 3)
    assert t.shape == (3, 360, 640) and r.shape == (3, 360, 640)
    assert np.isfinite(np.asarray(t)).all()


# ---------------------------------------------------------------------------
# The published aliasing goldens — the reference README's pinned JODs
# (README.md:108-111).  Full 60-frame clips; gated off the default CPU run
# (~90 s) — runs under `pytest -m tpu` on hardware or with FVVDP_TEST_MEDIA=1.
# Tolerance 0.05: the reference's own MATLAB<->Python agreement bound
# (README.md:168); the OpenCV decode differs from the piped-ffmpeg decode in
# chroma upsampling, measured drift is -0.019..-0.036 JOD on these clips.
# ---------------------------------------------------------------------------
_run_full = (os.environ.get("FVVDP_TEST_MEDIA") == "1"
             or os.environ.get("FVVDP_TEST_TPU") == "1")


@needs_media
@pytest.mark.tpu
@pytest.mark.slow
@pytest.mark.skipif(not _run_full, reason="60-frame ferris scoring; set "
                    "FVVDP_TEST_MEDIA=1 (CPU) or run `pytest -m tpu`")
@pytest.mark.parametrize("name,published", [
    ("ferris-bicubic-bicubic.mp4", 6.469),
    ("ferris-bicubic-nearest.mp4", 6.328),
    ("ferris-nearest-bicubic.mp4", 5.923),
    ("ferris-nearest-nearest.mp4", 5.821),
])
def test_ferris_published_jods(name, published):
    from fovvideovdp_tpu import fvvdp
    from fovvideovdp_tpu.video_source_file import fvvdp_video_source_file
    fv = fvvdp(display_name="standard_fhd")
    vs = fvvdp_video_source_file(os.path.join(ALIASING, name), REF,
                                 display_photometry="standard_fhd")
    Q, _ = fv.predict_video_source(vs)
    assert abs(Q - published) <= 0.05, (name, Q, published)


# ---------------------------------------------------------------------------
# Decode-matched file-path parity at the 0.01 bar: the SAME cv2-decoded
# frames were scored through the PyTorch reference (tools/gen_goldens.py
# section 8b), so the comparison holds the decoder fixed and the 0.05
# cross-decoder allowance is not needed.  Matches the reference pipeline
# pyfvvdp/video_source_file.py:166-276 + fvvdp.py:181-357 end-to-end.
# ---------------------------------------------------------------------------


@needs_media
def test_ferris_decode_matched_short(goldens):
    """12-frame ferris clip through fvvdp_video_source_file vs the reference
    scoring the identical decoded arrays: |dJOD| <= 0.01."""
    from fovvideovdp_tpu import fvvdp
    from fovvideovdp_tpu.video_source_file import fvvdp_video_source_file
    g = goldens("ferris_cv2_short")
    n = int(g["n_frames"])
    fv = fvvdp(display_name="standard_fhd")
    vs = fvvdp_video_source_file(TST, REF, display_photometry="standard_fhd",
                                 frames=n)
    Q, st = fv.predict_video_source(vs)
    assert abs(Q - float(g["Q_jod"])) <= 0.01, (Q, float(g["Q_jod"]))
    # per-band features should agree tightly too, not just the pooled JOD
    np.testing.assert_allclose(st["Q_per_ch"], g["Q_per_ch"],
                               rtol=2e-3, atol=2e-4)


@needs_media
@pytest.mark.slow
@pytest.mark.skipif(not _run_full, reason="60-frame ferris scoring; set "
                    "FVVDP_TEST_MEDIA=1 (CPU) or run `pytest -m tpu`")
def test_ferris_decode_matched_full(goldens):
    """Full 60-frame clip at the same 0.01 decode-matched bar."""
    from fovvideovdp_tpu import fvvdp
    from fovvideovdp_tpu.video_source_file import fvvdp_video_source_file
    g = goldens("ferris_cv2_full")
    fv = fvvdp(display_name="standard_fhd")
    vs = fvvdp_video_source_file(TST, REF, display_photometry="standard_fhd")
    Q, _ = fv.predict_video_source(vs)
    assert abs(Q - float(g["Q_jod"])) <= 0.01, (Q, float(g["Q_jod"]))


def test_np2vid_cv2_roundtrip(tmp_path, monkeypatch):
    """Video heatmap write-out works without the ffmpeg binary (OpenCV
    encoder) and the file decodes back with the right geometry."""
    import shutil as _shutil

    from fovvideovdp_tpu import run_fvvdp
    monkeypatch.setattr(_shutil, "which", lambda name: None)
    rng = np.random.RandomState(0)
    vid = rng.rand(6, 64, 96, 3).astype(np.float32)
    out = str(tmp_path / "heat.mp4")
    run_fvvdp.np2vid(vid, out, fps=30)
    cap = cv2.VideoCapture(out)
    assert cap.isOpened()
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 6
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 96
    assert int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)) == 64
    ok, frame = cap.read()
    assert ok and frame.shape == (64, 96, 3)
    cap.release()


@needs_media
def test_cv2_reader_pads_overreported_frame_count():
    """CAP_PROP_FRAME_COUNT can over-report (duration x fps estimate); a few
    phantom tail frames are papered over by repeating the last frame instead
    of crashing after the whole video was scored."""
    from fovvideovdp_tpu.video_source_file import cv2_video_reader
    with cv2_video_reader(REF) as r:
        true_n = r.frames
        r.frames = true_n + 2          # simulate a lying container
        got = 0
        last = None
        while True:
            b = r.get_frames_block(16)
            if b is None:
                break
            got += b.shape[0]
            last = b
        assert got == true_n + 2
        np.testing.assert_array_equal(last[-1], last[-2])  # padded tail
    # a grossly wrong count still fails loudly
    with cv2_video_reader(REF) as r:
        r.frames = r.frames + 50
        got = 0
        while True:
            b = r.get_frames_block(16)
            if b is None:
                break
            got += b.shape[0]
        assert got < r.frames - 1


@needs_media
def test_cv2_fallback_refuses_hdr_display():
    from fovvideovdp_tpu.video_source_file import fvvdp_video_source_file
    with pytest.raises(RuntimeError, match="8-bit SDR"):
        fvvdp_video_source_file(TST, REF,
                                display_photometry="standard_hdr_pq",
                                frames=2)
