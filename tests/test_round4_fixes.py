"""Round-4 hardening: non-finite-input containment in the dynamic-window
LUT interpolators, the renamed scan-capacity env var (with the legacy var
honoured under its ORIGINAL semantics), uint8 heatmap quantisation, and the
benchmark grid failing loudly when its goldens file is absent."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from fovvideovdp_tpu import fvvdp
from fovvideovdp_tpu.video_source import fvvdp_video_source_array

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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


# ---------------------------------------------------------------------------
# ADVICE r3: a single non-finite lane must not poison the dynamic knot window
# ---------------------------------------------------------------------------

def test_dyn_interp_nan_lane_confined():
    """table_interp_delta_dyn with one NaN lane must (a) keep every finite
    lane bit-identical to the static form and (b) yield NaN only in the
    offending lane."""
    import jax.numpy as jnp

    from fovvideovdp_tpu.ops.pallas import score_math

    rng = np.random.RandomState(3)
    n_grid, n_rows = 12, 2
    rows = jnp.asarray(rng.randn(n_rows, n_grid).astype(np.float32))
    u_clean = jnp.asarray(
        rng.uniform(2.0, 5.0, (8, 128)).astype(np.float32))
    u_nan = u_clean.at[3, 17].set(np.nan)

    ref = score_math.table_interp_delta(
        [rows[k] for k in range(n_rows)], u_clean, n_grid)
    got = score_math.table_interp_delta_dyn(rows, u_nan, n_grid, n_rows)
    for k in range(n_rows):
        g = np.asarray(got[k])
        assert np.isnan(g[3, 17]), "NaN lane must stay NaN"
        mask = np.ones_like(g, dtype=bool)
        mask[3, 17] = False
        np.testing.assert_allclose(g[mask], np.asarray(ref[k])[mask],
                                   rtol=1e-6, atol=1e-6)


def test_dyn_interp_all_nan_no_crash():
    import jax.numpy as jnp

    from fovvideovdp_tpu.ops.pallas import score_math

    rows = jnp.asarray(np.linspace(0, 1, 24, dtype=np.float32)[None])
    u = jnp.full((8, 128), np.nan, dtype=jnp.float32)
    (out,) = score_math.table_interp_delta_dyn(rows, u, 24, 1)
    assert np.isnan(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# ADVICE r3: scan env var rename — legacy name keeps its original meaning
# ---------------------------------------------------------------------------

def test_legacy_scan_env_is_chunk_budget(monkeypatch, caplog):
    """FVVDP_SCAN_MAX_BYTES (deprecated) is a luminance-chunk budget: a tiny
    value must force streaming (as it always did) and emit a deprecation
    warning, NOT be treated as total device capacity."""
    import logging

    tst, ref = _pair()
    fv = fvvdp(display_name="standard_fhd")
    monkeypatch.delenv("FVVDP_DISABLE_SCAN", raising=False)
    monkeypatch.delenv("FVVDP_SCAN_HBM_CAP_BYTES", raising=False)
    monkeypatch.setenv("FVVDP_SCAN_MAX_BYTES", "1000")
    with caplog.at_level(logging.WARNING):
        fv.predict_video_source(_source(fv, tst, ref))
    assert fv._exec_path == "stream"
    assert any("deprecated" in r.message for r in caplog.records)

    # a legacy budget large enough for a 2-block chunk still scans — the
    # 'scan small videos' configuration keeps working
    monkeypatch.setenv("FVVDP_SCAN_MAX_BYTES", str(64 << 20))
    fv.predict_video_source(_source(fv, tst, ref))
    assert fv._exec_path == "scan"


def test_new_cap_env_wins_over_legacy(monkeypatch):
    tst, ref = _pair()
    fv = fvvdp(display_name="standard_fhd")
    monkeypatch.delenv("FVVDP_DISABLE_SCAN", raising=False)
    # legacy says "scan freely", new cap says "no headroom": cap wins
    monkeypatch.setenv("FVVDP_SCAN_MAX_BYTES", str(64 << 20))
    monkeypatch.setenv("FVVDP_SCAN_HBM_CAP_BYTES", "1000")
    fv.predict_video_source(_source(fv, tst, ref))
    assert fv._exec_path == "stream"


# ---------------------------------------------------------------------------
# uint8 heatmaps
# ---------------------------------------------------------------------------

def test_heatmap_uint8_matches_float16():
    tst, ref = _pair(F=1)
    fv16 = fvvdp(display_name="standard_fhd", heatmap="threshold")
    fv8 = fvvdp(display_name="standard_fhd", heatmap="threshold",
                heatmap_dtype="uint8")
    _, st16 = fv16.predict(tst[..., 0], ref[..., 0], dim_order="HWC")
    Q8, st8 = fv8.predict(tst[..., 0], ref[..., 0], dim_order="HWC")
    h16 = np.asarray(st16["heatmap"], dtype=np.float32)
    h8 = np.asarray(st8["heatmap"])
    assert h8.dtype == np.uint8
    assert h8.shape == h16.shape
    assert h8.nbytes * 2 == np.asarray(st16["heatmap"]).nbytes
    np.testing.assert_allclose(h8 / 255.0, np.clip(h16, 0, 1),
                               atol=1.0 / 255.0 + 2e-3)
    assert np.isfinite(Q8)


def test_heatmap_uint8_video_streaming():
    tst, ref = _pair(F=6)
    fv8 = fvvdp(display_name="standard_fhd", heatmap="threshold",
                heatmap_dtype="uint8")
    Q, st = fv8.predict_video_source(_source(fv8, tst, ref))
    hm = np.asarray(st["heatmap"])
    assert hm.dtype == np.uint8 and hm.shape[2] == 6
    assert np.isfinite(Q)


def test_heatmap_uint8_rejects_raw():
    with pytest.raises(ValueError, match="colormapped"):
        fvvdp(display_name="standard_fhd", heatmap="raw",
              heatmap_dtype="uint8")
    with pytest.raises(ValueError, match="float16"):
        fvvdp(display_name="standard_fhd", heatmap="threshold",
              heatmap_dtype="int8")


def test_cli_heatmap_dtype_flag():
    from fovvideovdp_tpu.run_fvvdp import parse_args
    args = parse_args(["--test", "a.png", "--ref", "b.png",
                       "--heatmap", "threshold", "--heatmap-dtype", "uint8"])
    assert args.heatmap_dtype == "uint8"


# ---------------------------------------------------------------------------
# benchmark grid: absent goldens file must fail, not pass vacuously
# ---------------------------------------------------------------------------

def test_grid_missing_goldens_fails(monkeypatch, tmp_path, capsys):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    sys.path.insert(0, REPO)
    import benchmark_grid

    monkeypatch.setattr(benchmark_grid, "GOLDENS_PATH",
                        str(tmp_path / "absent.json"))
    monkeypatch.setenv("FVVDP_BENCH_ALLOW_CPU", "1")
    monkeypatch.setattr(
        sys, "argv",
        ["benchmark_grid.py", "--resolutions", "64x48", "--frames", "1",
         "--repeats", "1", "--display", "standard_fhd"])
    rc = benchmark_grid.main()
    assert rc == 1
    err = capsys.readouterr().err
    assert "no stored goldens" in err


def test_grid_update_goldens_writes_file(monkeypatch, tmp_path, capsys):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    sys.path.insert(0, REPO)
    import benchmark_grid

    path = str(tmp_path / "g.json")
    monkeypatch.setattr(benchmark_grid, "GOLDENS_PATH", path)
    monkeypatch.setenv("FVVDP_BENCH_ALLOW_CPU", "1")
    monkeypatch.setattr(
        sys, "argv",
        ["benchmark_grid.py", "--resolutions", "64x48", "--frames", "1",
         "--repeats", "1", "--display", "standard_fhd",
         "--update-goldens"])
    assert benchmark_grid.main() == 0
    with open(path, encoding="utf-8") as f:
        goldens = json.load(f)
    assert "standard_fhd/64x48/f1/plain" in goldens
    # and a second run against the just-pinned goldens passes
    monkeypatch.setattr(
        sys, "argv",
        ["benchmark_grid.py", "--resolutions", "64x48", "--frames", "1",
         "--repeats", "1", "--display", "standard_fhd"])
    assert benchmark_grid.main() == 0


# ---------------------------------------------------------------------------
# config-5 synthetic media determinism (grid <-> reference golden coupling)
# ---------------------------------------------------------------------------

def test_config5_media_deterministic(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from synth_media import write_config5_yuv_pair

    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    t1, r1 = write_config5_yuv_pair(str(tmp_path / "a"), 2)
    t2, r2 = write_config5_yuv_pair(str(tmp_path / "b"), 2)
    with open(t1, "rb") as f1, open(t2, "rb") as f2:
        assert f1.read() == f2.read()
    with open(r1, "rb") as f1, open(r2, "rb") as f2:
        assert f1.read() == f2.read()
    # name encodes 1080p 10-bit 4:2:0 BT.2020 30fps: 3.110.400 B per frame
    assert os.path.getsize(t1) == 2 * (1920 * 1080 + 2 * 960 * 540) * 2


def test_config5_scores_on_cpu(tmp_path):
    """The grid's config-5 source (10-bit PQ BT.2020 yuv + device resize)
    must score end-to-end; tiny frame count, CPU."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from synth_media import write_config5_yuv_pair

    from fovvideovdp_tpu.video_source_yuv import fvvdp_video_source_yuv_file

    tst, ref = write_config5_yuv_pair(str(tmp_path), 2)
    vs = fvvdp_video_source_yuv_file(
        tst, ref, display_photometry="standard_hdr_pq",
        full_screen_resize="bilinear", resize_resolution=[480, 270])
    fv = fvvdp(display_name="standard_hdr_pq", heatmap="threshold")
    Q, st = fv.predict_video_source(vs)
    assert np.isfinite(Q)
    assert st["heatmap"].shape[3:] == (270, 480)


def test_scan_oom_fallback_recovers_and_streams(monkeypatch):
    """A scan dispatch that dies with RESOURCE_EXHAUSTED must degrade to the
    streaming loop AND leave the device allocatable: on hardware the wedged
    chunk buffers made even a scalar device_put fail afterwards
    (docs/hw_campaign_r4.log stage 2), killing the promised fallback."""
    from fovvideovdp_tpu import core as core_mod

    tst, ref = _pair(F=6)
    fv = fvvdp(display_name="standard_fhd")
    monkeypatch.delenv("FVVDP_DISABLE_SCAN", raising=False)
    vs = fvvdp_video_source_array(tst, ref, 30, dim_order="HWCF",
                                  display_photometry=fv.display_photometry)
    Q_ref, _ = fv.predict_video_source(vs)
    assert fv._exec_path == "scan"

    waited = []
    monkeypatch.setattr(
        type(fv), "_wait_for_device_memory",
        staticmethod(lambda timeout_s=30.0: waited.append(1)))
    real_scan_fn = core_mod.MetricCore.video_scan_fn

    def exploding_scan_fn(self, *a, **k):
        raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error "
                           "(ResourceExhausted).")

    monkeypatch.setattr(core_mod.MetricCore, "video_scan_fn",
                        exploding_scan_fn)
    Q_fb, _ = fv.predict_video_source(vs)
    assert fv._exec_path == "stream"
    assert waited, "fallback must wait for HBM to become allocatable again"
    assert Q_fb == pytest.approx(Q_ref, abs=1e-3)
    monkeypatch.setattr(core_mod.MetricCore, "video_scan_fn", real_scan_fn)


def test_moving_gaze_scan_budget_margin(monkeypatch):
    """pass_gaze scans need 25% headroom margin: with headroom between 2x
    and 2.5x the per-block pair, a moving-gaze video must skip the scan
    attempt (hardware-calibrated: a 4K/60 moving-gaze scan with 64 MB of
    estimated margin OOMed where the same-estimate plain scan fit)."""
    tst, ref = _pair(F=9)
    fv = fvvdp(display_name="standard_fhd", foveated=True, block_frames=4)
    fix = np.stack([np.linspace(5, 58, 9), np.linspace(5, 42, 9)], axis=1)
    vs_kw = dict(dim_order="HWCF", display_photometry=fv.display_photometry)
    monkeypatch.delenv("FVVDP_DISABLE_SCAN", raising=False)

    per_block_pair = 4 * 48 * 64 * 4 * 2
    # legacy var = luminance-chunk headroom, its original meaning: 2.2x the
    # block pair passes the plain gate (2.0x) but not the moving one (2.5x)
    monkeypatch.setenv("FVVDP_SCAN_MAX_BYTES", str(int(2.2 * per_block_pair)))
    vs = fvvdp_video_source_array(tst, ref, 30, **vs_kw)
    fv.predict_video_source(vs, fixation_point=fix)
    assert fv._exec_path == "stream"

    fv2 = fvvdp(display_name="standard_fhd", block_frames=4)
    vs2 = fvvdp_video_source_array(tst, ref, 30, **vs_kw)
    fv2.predict_video_source(vs2)
    assert fv2._exec_path == "scan"


# ---------------------------------------------------------------------------
# 2x-unrolled dynamic knot loops: parity with the static form at every
# window-parity edge case (even/odd trip counts, width-1, collapsed, and
# windows touching the top knot — where the overhang knot's clamped load and
# zero clip weight must be exact)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("lo,hi", [
    (2.0, 6.0),    # i0=2, i1=6: even trips
    (2.0, 7.0),    # odd trips -> overhang knot
    (3.2, 4.1),    # width-1 window (single unrolled pair)
    (5.0, 5.0),    # collapsed: u exactly on a knot, zero trips
    (9.3, 11.0),   # i1 = n_grid-1: overhang at the top knot boundary
    (0.0, 11.0),   # full range
])
def test_dyn_interp_unroll_window_parity(lo, hi):
    import jax.numpy as jnp

    from fovvideovdp_tpu.ops.pallas import score_math

    rng = np.random.RandomState(11)
    n_grid, n_rows = 12, 2
    rows = jnp.asarray(rng.randn(n_rows, n_grid).astype(np.float32))
    u = jnp.asarray(rng.uniform(lo, hi, (8, 128)).astype(np.float32))
    # pin the window ends exactly so the intended (i0, i1) is reached
    u = u.at[0, 0].set(lo).at[0, 1].set(hi)

    ref = score_math.table_interp_delta(
        [rows[k] for k in range(n_rows)], u, n_grid)
    got = score_math.table_interp_delta_dyn(rows, u, n_grid, n_rows)
    for k in range(n_rows):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   rtol=1e-6, atol=1e-6)

    # shared_delta: rows 1+ are row 0 plus a scalar offset
    rows_sh = jnp.stack([rows[0], rows[0] + 0.375])
    ref_sh = score_math.table_interp_delta(
        [rows_sh[k] for k in range(2)], u, n_grid, shared_delta=True)
    got_sh = score_math.table_interp_delta_dyn(rows_sh, u, n_grid, 2,
                                               shared_delta=True)
    for k in range(2):
        np.testing.assert_allclose(np.asarray(got_sh[k]),
                                   np.asarray(ref_sh[k]),
                                   rtol=1e-6, atol=1e-6)


def test_mov_tile_shape_heuristic(monkeypatch):
    """CB is pinned to the 128 lane width (tile width drives the in-kernel
    eccentricity window), TR=64 amortises scalar window setup, short levels
    shrink TR to fit, and the perf-experiment env overrides round to legal
    multiples."""
    from fovvideovdp_tpu.ops.pallas.mov_score import _mov_tile_shape

    monkeypatch.delenv("FVVDP_MOV_TR", raising=False)
    monkeypatch.delenv("FVVDP_MOV_CB", raising=False)
    assert _mov_tile_shape(1600, 1440) == (64, 128)
    assert _mov_tile_shape(2160, 3840) == (64, 128)
    assert _mov_tile_shape(40, 256) == (40, 128)   # short level: TR fits h
    assert _mov_tile_shape(9, 128) == (16, 128)    # rounded up to 8s
    monkeypatch.setenv("FVVDP_MOV_TR", "37")
    monkeypatch.setenv("FVVDP_MOV_CB", "300")
    assert _mov_tile_shape(1600, 1440) == (32, 256)
