"""Round-2 correctness fixes: pu_dilate masking branch, batch-size guard,
predict_traced input validation, L_bkg clamp in ablation modes, non-uniform
CSF LUT grids."""
import jax.numpy as jnp
import numpy as np
import pytest

from fovvideovdp_tpu import csf as csf_mod
from fovvideovdp_tpu import fvvdp
from fovvideovdp_tpu.ops import masking as mask_ops
from fovvideovdp_tpu.utils import ImGaussFilt


@pytest.fixture(scope="module")
def small_pair():
    rng = np.random.RandomState(7)
    ref = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    tst = np.clip(ref / 255.0 + rng.randn(*ref.shape) * 0.06, 0, 1)
    return (tst * 255).astype(np.uint8), ref


# ---------------------------------------------------------------------------
# pu_dilate (phase-uncertainty dilation; matlab/fvvdp_core.m:546-552 — the
# Python reference's branch crashes, so MATLAB is the semantic authority)
# ---------------------------------------------------------------------------
def test_pu_dilate_changes_masking():
    rng = np.random.RandomState(0)
    T = jnp.asarray(rng.randn(2, 16, 24).astype(np.float32))
    R = jnp.asarray(rng.randn(2, 16, 24).astype(np.float32))
    N = jnp.asarray(rng.rand(2, 16, 24).astype(np.float32) + 0.05)

    D0 = mask_ops.apply_masking_model(T, R, N, 2.4, 2.43, -0.97, pu_dilate=0.0)
    D1 = mask_ops.apply_masking_model(T, R, N, 2.4, 2.43, -0.97, pu_dilate=0.7)
    assert not np.allclose(np.asarray(D0), np.asarray(D1))

    # manual composition: blur the mutual-masking signal, then the same norm
    Tn, Rn = np.asarray(T / N), np.asarray(R / N)
    M = np.minimum(np.abs(Tn), np.abs(Rn))
    gf = ImGaussFilt(0.7, pad_mode="edge")
    M_blur = np.asarray(gf.run(jnp.asarray(M)[:, None]))[:, 0]
    M_pu = (10.0 ** -0.97) * M_blur
    D_manual = np.clip(np.abs(Tn - Rn) ** 2.4 / (1.0 + M_pu ** 2.43), None, 1e4)
    np.testing.assert_allclose(np.asarray(D1), D_manual, rtol=1e-5, atol=1e-6)


def test_pu_dilate_override_changes_q(small_pair):
    tst, ref = small_pair
    Q0, _ = fvvdp(display_name="standard_fhd").predict(tst, ref, dim_order="HWC")
    Q1, _ = fvvdp(display_name="standard_fhd",
                  parameter_overrides={"pu_dilate": 0.5}).predict(
                      tst, ref, dim_order="HWC")
    assert np.isfinite(Q1) and 0 <= Q1 <= 10
    assert abs(Q0 - Q1) > 1e-6


# ---------------------------------------------------------------------------
# input validation
# ---------------------------------------------------------------------------
def test_batch_gt1_raises(small_pair):
    tst, ref = small_pair
    t2 = np.stack([tst, tst])[:, None].transpose(0, 4, 1, 2, 3)  # (2,C,1,H,W)
    r2 = np.stack([ref, ref])[:, None].transpose(0, 4, 1, 2, 3)
    fv = fvvdp(display_name="standard_fhd")
    with pytest.raises(RuntimeError, match="predict_batch"):
        fv.predict(t2, r2, dim_order="BCFHW")


def test_predict_traced_video_requires_fps(small_pair):
    tst, ref = small_pair
    t = np.repeat(tst[None], 3, axis=0).astype(np.float32) / 255.0  # (F,H,W,C)
    fv = fvvdp(display_name="standard_fhd")
    with pytest.raises(RuntimeError, match="frames_per_second"):
        fv.predict_traced(t, t, dim_order="FHWC", frames_per_second=0)


# ---------------------------------------------------------------------------
# L_bkg >= 0.1 clamp in the non-default local-adaptation modes
# (pyfvvdp/fvvdp.py:496-498)
# ---------------------------------------------------------------------------
def test_dark_content_ablation_mode_clamped():
    # content below 0.1 cd/m^2: without the clamp, Weber contrast explodes
    rng = np.random.RandomState(1)
    ref = rng.rand(32, 48).astype(np.float32) * 0.05 + 0.01  # cd/m^2
    tst = np.clip(ref + rng.randn(32, 48).astype(np.float32) * 0.002, 1e-4, None)
    from fovvideovdp_tpu.display_model import fvvdp_display_photo_absolute
    for mode in ("gpyr0", "global"):
        fv = fvvdp(display_name="standard_fhd",
                   display_photometry=fvvdp_display_photo_absolute(),
                   parameter_overrides={"local_adapt": mode})
        Q, _ = fv.predict(tst[..., None], ref[..., None], dim_order="HWC")
        assert np.isfinite(Q) and 0 <= Q <= 10
        # clamped L_bkg >= 0.1 bounds the contrast at 10*peak/0.1; with the
        # tiny distortion above, Q must stay in the near-visible range rather
        # than saturating to 0 as the unclamped division would
        assert Q > 5.0


# ---------------------------------------------------------------------------
# non-uniform user LUT grids (reference .mat caches may have any monotone
# grid; ADVICE round 1)
# ---------------------------------------------------------------------------
def _warp(grid):
    """Monotone non-uniform warp of a uniform grid with same endpoints."""
    g = np.asarray(grid, dtype=np.float64)
    u = (g - g[0]) / (g[-1] - g[0])
    return (g[0] + (g[-1] - g[0]) * u ** 1.35).astype(np.float32)


def _fake_nonuniform_lut():
    rng = np.random.RandomState(5)
    n = 8
    Y_log = _warp(np.linspace(-10, 13, n))
    rho_log = _warp(np.linspace(-4, 6, n))
    ecc_sqrt = _warp(np.linspace(0, np.sqrt(120), n))
    lut = {
        "Y_log": Y_log, "rho_log": rho_log, "ecc_sqrt": ecc_sqrt,
        "Y": (2.0 ** Y_log), "rho": (2.0 ** rho_log), "ecc": ecc_sqrt ** 2,
        "S_log": rng.rand(n, n, n).astype(np.float32) * 4.0,
    }
    lut = {k: jnp.asarray(v) for k, v in lut.items()}
    lut["_uniform"] = {ax: csf_mod._grid_is_uniform(np.asarray(lut[ax]))
                       for ax in ("Y_log", "rho_log", "ecc_sqrt")}
    assert not csf_mod.lut_is_uniform(lut)
    return lut


def test_nonuniform_lut_trilinear_matches_interp3():
    lut = _fake_nonuniform_lut()
    rng = np.random.RandomState(6)
    L = jnp.asarray(rng.rand(11, 13).astype(np.float32) * 900 + 0.01)
    rho = jnp.asarray(rng.rand(11, 13).astype(np.float32) * 30 + 0.1)
    ecc = jnp.asarray(rng.rand(11, 13).astype(np.float32) * 100)
    S_fast = np.asarray(csf_mod.sensitivity_trilinear(lut, rho, L, ecc))
    S_ref = np.asarray(csf_mod.sensitivity(lut, rho, L, ecc))
    np.testing.assert_allclose(S_fast, S_ref, rtol=2e-4)


def test_nonuniform_lut_1d_matches_interp3():
    lut = _fake_nonuniform_lut()
    rng = np.random.RandomState(8)
    L = jnp.asarray(rng.rand(9, 17).astype(np.float32) * 900 + 0.01)
    rho, ecc = 4.0, 0.0
    table = csf_mod.reduce_lut_to_1d(lut, rho, ecc)
    S_fast = np.asarray(csf_mod.sensitivity_1d(lut, table, L))
    S_ref = np.asarray(csf_mod.sensitivity(lut, rho, L, ecc))
    np.testing.assert_allclose(S_fast, S_ref, rtol=2e-4)


def test_uniform_flag_detected_on_shipped_luts():
    lut = csf_mod.CSFCache().get(0.0, -1.5, 0.604562)
    assert csf_mod.lut_is_uniform(lut)


# ---------------------------------------------------------------------------
# fixed-gaze foveated fast path (CSF collapsed to per-pixel luminance tables)
# ---------------------------------------------------------------------------
def test_static_gaze_matches_moving_gaze_at_same_point():
    rng = np.random.RandomState(11)
    F, H, W = 4, 36, 52
    ref = (rng.rand(H, W, 3, F) * 255).astype(np.uint8)
    tst = np.clip(ref.astype(np.int16) + rng.randint(-18, 18, ref.shape),
                  0, 255).astype(np.uint8)
    fix = np.array([W // 3, H // 2])

    fv = fvvdp(display_name="standard_hmd", foveated=True)
    Q_static, _ = fv.predict(tst, ref, dim_order="HWCF", frames_per_second=30,
                             fixation_point=fix)
    # an (F, 2) fixation forces the dynamic per-frame trilinear path
    Q_dynamic, _ = fv.predict(tst, ref, dim_order="HWCF", frames_per_second=30,
                              fixation_point=np.tile(fix, (F, 1)))
    np.testing.assert_allclose(Q_static, Q_dynamic, rtol=1e-5, atol=1e-5)


def test_pixel_tables_match_trilinear():
    lut = csf_mod.CSFCache().get(0.0, -1.5, 0.604562)
    rng = np.random.RandomState(12)
    h, w = 17, 23
    rho = jnp.asarray(rng.rand(h, w).astype(np.float32) * 30 + 0.1)
    ecc = jnp.asarray(rng.rand(h, w).astype(np.float32) * 100)
    L = jnp.asarray(rng.rand(3, h, w).astype(np.float32) * 900 + 0.01)
    tables = csf_mod.reduce_lut_to_pixel_tables(lut, rho, ecc)
    S_fast = np.asarray(csf_mod.sensitivity_pixel_tables(lut, tables, L))
    S_ref = np.asarray(csf_mod.sensitivity_trilinear(
        lut, jnp.broadcast_to(rho, L.shape), L, jnp.broadcast_to(ecc, L.shape)))
    np.testing.assert_allclose(S_fast, S_ref, rtol=2e-4)


# ---------------------------------------------------------------------------
# device upload of multi-byte dtypes: the flat-uint8 + device-side bitcast
# scheme compiled to a u32[N,4] intermediate whose minor dim TPU tiling pads
# 4 -> 128 (a 32x HBM blow-up, OOM on 20-frame float32 FHD inputs).  Chunks
# must be cut on element boundaries in the native dtype instead.
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.float32])
def test_upload_as_cfhw_native_dtype_chunks(monkeypatch, dtype):
    from fovvideovdp_tpu import video_source as vs
    rng = np.random.RandomState(5)
    raw = rng.rand(9, 11, 3, 4)  # HWCF
    raw = (raw * 200).astype(dtype)
    monkeypatch.setattr(vs, "_UPLOAD_CHUNK_BYTES", 257)  # force many chunks
    got = np.asarray(vs._upload_as_cfhw(raw, "HWCF"))
    want = np.transpose(raw, (2, 3, 0, 1))  # CFHW
    assert got.dtype == raw.dtype
    np.testing.assert_array_equal(got, want)
