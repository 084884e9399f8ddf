"""Round-3 hardening: defensive env parsing, fail-fast mesh/degraded paths,
scan-budget accounting of resident frames, the bounded scan-chunk ladder, and
the device-heatmap HBM guard."""
import numpy as np
import pytest

from fovvideovdp_tpu import fvvdp
from fovvideovdp_tpu.video_source import fvvdp_video_source_array


def _pair(F=6, H=48, W=64, C=3, seed=7):
    rng = np.random.RandomState(seed)
    ref = rng.randint(0, 255, (H, W, C, F), dtype=np.uint8)
    tst = np.clip(ref.astype(np.int16) + rng.randint(-14, 14, ref.shape),
                  0, 255).astype(np.uint8)
    return tst, ref


def _source(metric, tst, ref, fps=30):
    return fvvdp_video_source_array(
        tst, ref, fps, dim_order="HWCF",
        display_photometry=metric.display_photometry)


def test_malformed_scan_budget_env_falls_back(monkeypatch):
    tst, ref = _pair()
    fv = fvvdp(display_name="standard_fhd")
    monkeypatch.delenv("FVVDP_DISABLE_SCAN", raising=False)
    monkeypatch.setenv("FVVDP_SCAN_HBM_CAP_BYTES", "not-a-number")
    Q, _ = fv.predict_video_source(_source(fv, tst, ref))
    assert fv._exec_path == "scan"  # default budget applied, not a crash
    assert np.isfinite(Q)


def test_short_moving_gaze_raises_descriptive():
    tst, ref = _pair(F=6)
    fv = fvvdp(display_name="standard_fhd", foveated=True)
    fix = np.stack([np.linspace(5, 50, 4), np.linspace(5, 40, 4)], axis=1)
    with pytest.raises(RuntimeError, match="per-frame rows"):
        fv.predict_video_source(_source(fv, tst, ref), fixation_point=fix)


def test_mesh_foveated_image_raises():
    from fovvideovdp_tpu.parallel import make_mesh
    tst, ref = _pair(F=1)
    fv = fvvdp(display_name="standard_fhd", foveated=True)
    with pytest.raises(RuntimeError, match="predict_batch"):
        fv.predict(tst, ref, dim_order="HWCF", mesh=make_mesh())


def test_mesh_ablation_raises():
    from fovvideovdp_tpu.parallel import make_mesh
    tst, ref = _pair(F=4)
    fv = fvvdp(display_name="standard_fhd", do_temporal_channels=False)
    with pytest.raises(RuntimeError, match="do_temporal_channels"):
        fv.predict(tst, ref, dim_order="HWCF", frames_per_second=30,
                   mesh=make_mesh())


def test_device_heatmap_budget_guard(monkeypatch):
    tst, ref = _pair(F=4)
    fv = fvvdp(display_name="standard_fhd", heatmap="threshold",
               device_heatmap=True)
    monkeypatch.setenv("FVVDP_DEVICE_HEATMAP_MAX_BYTES", "1024")
    with pytest.raises(RuntimeError, match="device memory"):
        fv.predict_video_source(_source(fv, tst, ref))
    monkeypatch.delenv("FVVDP_DEVICE_HEATMAP_MAX_BYTES")
    Q, st = fv.predict_video_source(_source(fv, tst, ref))
    assert st["heatmap"].shape[2] == 4


def _scan_working_set(metric, vs, table_bytes=0):
    """(fixed bytes, per-block chunk-pair bytes) of the scan estimate, mirroring
    _try_scan_video's accounting so tests can place the cap just above/below."""
    from fovvideovdp_tpu.fvvdp import _BLOCK_TEMP_BYTES_PER_PX
    from fovvideovdp_tpu.ops import temporal as temporal_ops
    H, W, F = vs.get_video_size()
    px = H * W
    fl = temporal_ops.filter_len_for_fps(vs.get_frames_per_second())
    B = metric._pick_block_size(H, W, F, table_bytes=table_bytes)
    fixed = (vs.device_resident_bytes() + table_bytes
             + _BLOCK_TEMP_BYTES_PER_PX * B * px + (fl - 1) * px * 8)
    return fixed, B * px * 8


def test_scan_budget_counts_resident_frames(monkeypatch):
    """Cap just below fixed+2-block headroom must keep the streaming path;
    the resident raw frames are part of the accounted working set."""
    tst, ref = _pair(F=6)
    fv = fvvdp(display_name="standard_fhd")
    vs = _source(fv, tst, ref)
    assert vs.device_resident_bytes() == tst.nbytes + ref.nbytes
    monkeypatch.delenv("FVVDP_DISABLE_SCAN", raising=False)
    fixed, per_block = _scan_working_set(fv, vs)
    # enough headroom for a 2-block chunk ONLY if the resident frames were
    # ignored -> must stream
    monkeypatch.setenv("FVVDP_SCAN_HBM_CAP_BYTES",
                       str(fixed + 2 * per_block
                           - vs.device_resident_bytes() // 2))
    fv.predict_video_source(vs)
    assert fv._exec_path == "stream"
    monkeypatch.setenv("FVVDP_SCAN_HBM_CAP_BYTES",
                       str(fixed + 2 * per_block + 10**4))
    fv.predict_video_source(vs)
    assert fv._exec_path == "scan"


def test_scan_ladder_all_rungs_match_streaming(monkeypatch):
    """n_blocks = 11 exercises the full (8, 2, 1) chunk ladder; the chained
    carries must reproduce the streaming loop exactly."""
    tst, ref = _pair(F=11, H=32, W=48)
    fv = fvvdp(display_name="standard_fhd", block_frames=1)
    monkeypatch.delenv("FVVDP_DISABLE_SCAN", raising=False)
    Q_scan, st_scan = fv.predict_video_source(_source(fv, tst, ref))
    assert fv._exec_path == "scan"
    monkeypatch.setenv("FVVDP_DISABLE_SCAN", "1")
    Q_str, st_str = fv.predict_video_source(_source(fv, tst, ref))
    assert fv._exec_path == "stream"
    np.testing.assert_allclose(st_scan["Q_per_ch"], st_str["Q_per_ch"],
                               rtol=1e-4, atol=1e-6)
    assert Q_scan == pytest.approx(Q_str, abs=1e-3)


def test_exec_path_reset_between_calls(monkeypatch):
    """_exec_path must reflect THIS call: an image scored after a scanned
    video reports 'image', not a stale 'scan'."""
    monkeypatch.delenv("FVVDP_DISABLE_SCAN", raising=False)
    tst, ref = _pair(F=6)
    fv = fvvdp(display_name="standard_fhd")
    fv.predict_video_source(_source(fv, tst, ref))
    assert fv._exec_path == "scan"
    fv.predict_video_source(_source(fv, tst[..., :1], ref[..., :1], fps=0))
    assert fv._exec_path == "image"
    fv2 = fvvdp(display_name="standard_fhd", do_temporal_channels=False)
    fv2.predict_video_source(_source(fv2, tst, ref))
    assert fv2._exec_path == "ablation"


def test_fov_tables_charged_against_block_budget():
    """The fixed-gaze per-pixel CSF tables (~1.6 GB HBM-resident at 4K) must
    shrink the auto block size — ignoring them compiled >HBM programs
    (4K foveated 60-frame scan exceeded the 15.75 GB chip by 179 MB)."""
    fv = fvvdp(display_name="standard_4k", foveated=True)
    core = fv._get_core(3840, 2160)
    tb = core.fov_table_bytes()
    assert tb > 1 << 30  # GB-scale at 4K
    B_plain = fv._pick_block_size(2160, 3840, 60)
    B_fov = fv._pick_block_size(2160, 3840, 60, table_bytes=tb)
    assert B_fov < B_plain
    assert B_fov >= 8  # still large enough to amortise dispatch
    # non-foveated metrics report no table footprint
    fvp = fvvdp(display_name="standard_4k")
    assert fvp._get_core(3840, 2160).fov_table_bytes() == 0


def test_scan_budget_counts_fov_tables(monkeypatch):
    """With the budget squeezed to just above the luminance-pair size, a
    foveated fixed-gaze video must reject the scan (tables don't fit) while
    the plain metric still scans."""
    tst, ref = _pair(F=6, H=48, W=64)
    fvf = fvvdp(display_name="htc_vive_pro", foveated=True)
    tabs = fvf._get_core(64, 48).fov_table_bytes()
    assert tabs > 0
    src = _source(fvf, tst, ref)
    fixed, per_block = _scan_working_set(fvf, src, table_bytes=tabs)
    # cap admits a 2-block chunk WITHOUT the tables, not with them
    cap = fixed - tabs // 2 + 2 * per_block
    monkeypatch.setenv("FVVDP_SCAN_HBM_CAP_BYTES", str(cap))
    monkeypatch.delenv("FVVDP_DISABLE_SCAN", raising=False)
    fv = fvvdp(display_name="standard_fhd")
    fv.predict_video_source(_source(fv, tst, ref))
    assert fv._exec_path == "scan"
    fvf.predict_video_source(src, fixation_point=np.array([32, 24]))
    assert fvf._exec_path == "stream"


def test_moving_gaze_evicts_static_fov_tables():
    """A fixed-then-moving gaze sequence on one metric must drop the
    GB-scale static-gaze CSF tables before the moving path runs (at 4K the
    stale cache entry OOMs the chip)."""
    tst, ref = _pair(F=6)
    fv = fvvdp(display_name="htc_vive_pro", foveated=True)
    src = _source(fv, tst, ref)
    Qs, _ = fv.predict_video_source(src, fixation_point=np.array([32, 24]))
    core = fv._get_core(64, 48)
    assert len(core._fov_table_cache) == 1
    fix = np.stack([np.linspace(5, 60, 6), np.linspace(5, 40, 6)], axis=1)
    Qm, _ = fv.predict_video_source(src, fixation_point=fix)
    assert len(core._fov_table_cache) == 0
    assert np.isfinite(Qs) and np.isfinite(Qm)
