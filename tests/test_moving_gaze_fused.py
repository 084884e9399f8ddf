"""Fused moving-gaze foveated path: per-frame CSF tables from the windowed
MXU collapse + the per-pixel-table Pallas kernel (interpret mode on CPU)
must equal the jnp block-amortised trilinear composition it replaces."""
import numpy as np
import jax.numpy as jnp
import pytest

from fovvideovdp_tpu import fvvdp
from fovvideovdp_tpu.ops import pallas as cfg


def _make_core(W=256, H=64):
    import __graft_entry__ as ge
    return ge._make_core(W, H, foveated=True)


def test_rho_window_weights_match_dense():
    """Windowed static rho weights == the dense one-hot rows of the full
    grid (terms outside the window are exactly zero)."""
    from fovvideovdp_tpu import csf as csf_mod
    core = _make_core()
    lut = core.luts[0]
    for bb in (0, 2):
        rho = np.asarray(core._band_rho[bb])
        r_lo, r_hi, w_r = csf_mod.rho_window_weights(lut, rho)
        rho_q = jnp.log2(jnp.clip(jnp.asarray(rho).reshape(-1),
                                  lut["rho"][0], lut["rho"][-1]))
        dense = np.asarray(csf_mod._grid_weights(
            rho_q, lut["rho_log"], csf_mod._axis_uniform(lut, "rho_log")))
        assert np.abs(dense[:, :r_lo]).max() == 0.0
        assert np.abs(dense[:, r_hi + 1:]).max() == 0.0
        # host numpy and XLA float32 round (q-x0)/dx differently by ~1 ulp
        np.testing.assert_allclose(w_r.reshape(-1, w_r.shape[-1]),
                                   dense[:, r_lo:r_hi + 1], atol=4e-6)


def test_mov_tables_match_reference_collapse():
    """Per-frame tables from the windowed collapse == the (Y-trimmed)
    fixed-gaze reference collapse at the same eccentricity map."""
    from fovvideovdp_tpu import csf as csf_mod
    core = _make_core()
    rng = np.random.RandomState(5)
    bb = 1
    h, w = core.plan.level_shapes[bb]
    ecc = jnp.asarray(rng.uniform(0, 60, (h, w)).astype(np.float32))
    tab_s, tab_t = core._mov_tables_for_frame(bb, ecc)
    for cc, tab in ((0, tab_s), (1, tab_t)):
        ref = csf_mod.reduce_lut_to_pixel_tables(
            core.luts[cc], core._band_rho[bb], ecc)
        if core._fov_trim is not None:
            lo, hi = core._fov_trim
            ref = ref[lo:hi + 1]
        np.testing.assert_allclose(np.asarray(tab), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_moving_gaze_video_fused_matches_jnp():
    """End-to-end: foveated video with a per-frame gaze trajectory scored
    with the fused path (Pallas interpret) == the jnp trilinear path."""
    rng = np.random.RandomState(11)
    H, W, F = 64, 256, 4
    ref = rng.randint(0, 255, (H, W, 3, F), dtype=np.uint8)
    tst = np.clip(ref.astype(np.int16) + rng.randint(-18, 18, ref.shape),
                  0, 255).astype(np.uint8)
    gaze = np.stack([np.linspace(5, W - 5, F),
                     np.linspace(5, H - 5, F)], axis=1)

    fv = fvvdp(display_name="htc_vive_pro", foveated=True)
    with cfg.forced(False):
        Q_jnp, st_jnp = fv.predict(tst, ref, dim_order="HWCF",
                                   frames_per_second=30,
                                   fixation_point=gaze)
    fv2 = fvvdp(display_name="htc_vive_pro", foveated=True)
    with cfg.forced(True, interpret=True):
        Q_pal, st_pal = fv2.predict(tst, ref, dim_order="HWCF",
                                    frames_per_second=30,
                                    fixation_point=gaze)
    np.testing.assert_allclose(st_pal["Q_per_ch"], st_jnp["Q_per_ch"],
                               rtol=2e-4, atol=2e-5)
    assert Q_pal == pytest.approx(Q_jnp, abs=2e-3)


def test_moving_gaze_image_fused_matches_jnp():
    """Single foveated image with an explicit (1, 2) trajectory exercises
    the temp_ch == 1 arm of the fused moving-gaze branch."""
    rng = np.random.RandomState(12)
    H, W = 64, 256
    ref = rng.randint(0, 255, (H, W, 3), dtype=np.uint8)
    tst = np.clip(ref.astype(np.int16) + rng.randint(-18, 18, ref.shape),
                  0, 255).astype(np.uint8)
    gaze = np.asarray([[30.0, 40.0]])  # 2-D -> dynamic-gaze path

    fv = fvvdp(display_name="htc_vive_pro", foveated=True)
    with cfg.forced(False):
        Q_jnp, _ = fv.predict(tst, ref, dim_order="HWC",
                              fixation_point=gaze)
    fv2 = fvvdp(display_name="htc_vive_pro", foveated=True)
    with cfg.forced(True, interpret=True):
        Q_pal, _ = fv2.predict(tst, ref, dim_order="HWC",
                               fixation_point=gaze)
    assert Q_pal == pytest.approx(Q_jnp, abs=2e-3)
