"""The one-dispatch whole-video scan path (core.video_scan_fn) must produce
the same scores as the pipelined streaming loop it replaces — the scan body
IS the streaming step, so the numerics should agree to float tolerance —
and must engage exactly when it is safe to (device-resident source, no
heatmap/checkpoint/mesh, within the HBM budget)."""
import numpy as np
import pytest

from fovvideovdp_tpu import fvvdp
from fovvideovdp_tpu.video_source import fvvdp_video_source_array


def _pair(F=13, H=48, W=64, C=3, seed=3):
    rng = np.random.RandomState(seed)
    ref = rng.randint(0, 255, (H, W, C, F), dtype=np.uint8)
    tst = np.clip(ref.astype(np.int16) + rng.randint(-14, 14, ref.shape),
                  0, 255).astype(np.uint8)
    return tst, ref


def _source(metric, tst, ref, fps=30):
    return fvvdp_video_source_array(
        tst, ref, fps, dim_order="HWCF",
        display_photometry=metric.display_photometry)


def _both_paths(metric, tst, ref, monkeypatch, fix=None):
    """Score via the scan path and the forced streaming path; assert each
    actually took the path it was supposed to."""
    monkeypatch.delenv("FVVDP_DISABLE_SCAN", raising=False)
    Q_scan, st_scan = metric.predict_video_source(
        _source(metric, tst, ref), fixation_point=fix)
    assert metric._exec_path == "scan"
    monkeypatch.setenv("FVVDP_DISABLE_SCAN", "1")
    Q_str, st_str = metric.predict_video_source(
        _source(metric, tst, ref), fixation_point=fix)
    assert metric._exec_path == "stream"
    return (Q_scan, st_scan), (Q_str, st_str)


def _assert_match(scan, stream):
    (Q_s, st_s), (Q_t, st_t) = scan, stream
    # same ops, but scan lets XLA re-fuse across the block boundary —
    # reduction re-association wiggles the last float bits
    np.testing.assert_allclose(st_s["Q_per_ch"], st_t["Q_per_ch"],
                               rtol=1e-4, atol=1e-6)
    assert Q_s == pytest.approx(Q_t, abs=1e-3)


def test_scan_matches_streaming_with_tail_block(monkeypatch):
    tst, ref = _pair(F=13)
    fv = fvvdp(display_name="standard_fhd", block_frames=4)  # 4 blocks, tail=3
    scan, stream = _both_paths(fv, tst, ref, monkeypatch)
    _assert_match(scan, stream)


def test_scan_matches_streaming_single_block(monkeypatch):
    tst, ref = _pair(F=6)
    fv = fvvdp(display_name="standard_fhd")  # default B >= F: one scan step
    scan, stream = _both_paths(fv, tst, ref, monkeypatch)
    _assert_match(scan, stream)


@pytest.mark.parametrize("padding", ["circular", "pingpong"])
def test_scan_matches_streaming_padding_modes(monkeypatch, padding):
    tst, ref = _pair(F=9)
    fv = fvvdp(display_name="standard_fhd", block_frames=4,
               temp_padding=padding)
    scan, stream = _both_paths(fv, tst, ref, monkeypatch)
    _assert_match(scan, stream)


def test_scan_foveated_fixed_gaze(monkeypatch):
    tst, ref = _pair(F=9)
    fv = fvvdp(display_name="standard_fhd", foveated=True, block_frames=4)
    fix = np.array([20.0, 30.0], dtype=np.float32)
    scan, stream = _both_paths(fv, tst, ref, monkeypatch, fix=fix)
    _assert_match(scan, stream)


def test_scan_foveated_moving_gaze(monkeypatch):
    tst, ref = _pair(F=9)
    fv = fvvdp(display_name="standard_fhd", foveated=True, block_frames=4)
    fix = np.stack([np.linspace(5, 58, 9), np.linspace(5, 42, 9)], axis=1)
    scan, stream = _both_paths(fv, tst, ref, monkeypatch, fix=fix)
    _assert_match(scan, stream)


def test_heatmap_keeps_streaming_path(monkeypatch):
    monkeypatch.delenv("FVVDP_DISABLE_SCAN", raising=False)
    tst, ref = _pair(F=6)
    fv = fvvdp(display_name="standard_fhd", heatmap="threshold")
    Q, st = fv.predict_video_source(_source(fv, tst, ref))
    assert fv._exec_path == "stream"
    assert "heatmap" in st


def test_memory_budget_falls_back_to_streaming(monkeypatch):
    tst, ref = _pair(F=6)
    fv = fvvdp(display_name="standard_fhd")
    monkeypatch.delenv("FVVDP_DISABLE_SCAN", raising=False)
    monkeypatch.setenv("FVVDP_SCAN_MAX_BYTES", "1000")
    Q_str, st_str = fv.predict_video_source(_source(fv, tst, ref))
    assert fv._exec_path == "stream"
    monkeypatch.delenv("FVVDP_SCAN_MAX_BYTES")
    Q_scan, _ = fv.predict_video_source(_source(fv, tst, ref))
    assert fv._exec_path == "scan"
    assert Q_scan == pytest.approx(Q_str, abs=1e-4)


def test_host_only_source_keeps_streaming(monkeypatch):
    """A source whose blocks are built host-side must keep the pipelined
    streaming loop (the scan path would serialise its host work)."""
    monkeypatch.delenv("FVVDP_DISABLE_SCAN", raising=False)
    tst, ref = _pair(F=6)
    fv = fvvdp(display_name="standard_fhd")
    vs = _source(fv, tst, ref)
    monkeypatch.setattr(vs, "_preload_device", False)
    assert not vs.luminance_is_device_resident()
    fv.predict_video_source(vs)
    assert fv._exec_path == "stream"
