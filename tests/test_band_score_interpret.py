"""Interpret-mode parity for the band-score kernels on CPU.

test_pallas_kernels.py covers these on real TPU hardware; this file runs the
same kernels through the Pallas interpreter so the default (CPU) suite
catches numerics regressions in the shared score_math helpers without a
chip."""
import numpy as np
import jax.numpy as jnp
import pytest

from fovvideovdp_tpu.ops import pallas as cfg
from fovvideovdp_tpu.ops.pallas import band_score as bs


@pytest.fixture(scope="module")
def core():
    import __graft_entry__ as ge
    return ge._make_core(256, 64)


def _lut_meta(core, q_key):
    p = core.params
    Y_log = np.asarray(core.luts[0]["Y_log"])
    Y = np.asarray(core.luts[0]["Y"])
    corr = 10.0 ** (p["sensitivity_correction"] / 20)
    return (float(Y_log[0]), float((Y_log[-1] - Y_log[0]) / 31),
            float(Y[0]), float(Y[-1]), float(p["mask_p"]), float(p[q_key]),
            float(10.0 ** p["mask_c"]), float(corr), float(p["beta"]))


def test_band_score_interpret_parity(core):
    p = core.params
    rng = np.random.RandomState(0)
    T = jnp.asarray(rng.randn(2, 64, 256).astype(np.float32))
    R = T + 0.03
    L = jnp.asarray((rng.rand(2, 64, 256) * 300 + 0.5).astype(np.float32))
    corr = 10.0 ** (p["sensitivity_correction"] / 20)
    tbl = core._band_tables[0][0]
    with cfg.forced(True, interpret=True):
        got = np.asarray(bs.band_score_pallas(
            T, R, L, tbl, core.luts[0], p["mask_p"], p["mask_q_sust"],
            p["mask_c"], corr, p["beta"]))
    want = np.asarray(bs._band_score_jnp(T, R, L, jnp.asarray(tbl),
                                         _lut_meta(core, "mask_q_sust")))
    np.testing.assert_allclose(got, want, rtol=5e-5)


def test_band_score2_interpret_parity(core):
    p = core.params
    rng = np.random.RandomState(3)
    band = jnp.asarray(rng.randn(2, 4, 64, 256).astype(np.float32))
    L = jnp.asarray((rng.rand(2, 64, 256) * 300 + 0.5).astype(np.float32))
    corr = 10.0 ** (p["sensitivity_correction"] / 20)
    tabs = np.stack(core._band_tables[0][:2])
    with cfg.forced(True, interpret=True):
        got = np.asarray(bs.band_score2_pallas(
            band, L, tabs, core.luts[0], p["mask_p"], p["mask_q_sust"],
            p["mask_q_trans"], p["mask_c"], corr, p["beta"]))
    ws = np.asarray(bs._band_score_jnp(band[:, 0], band[:, 1], L,
                                       jnp.asarray(tabs[0]),
                                       _lut_meta(core, "mask_q_sust")))
    wt = np.asarray(bs._band_score_jnp(band[:, 2], band[:, 3], L,
                                       jnp.asarray(tabs[1]),
                                       _lut_meta(core, "mask_q_trans")))
    np.testing.assert_allclose(got, np.stack([ws, wt], -1), rtol=5e-5)


def test_band_score2_fov_interpret_parity(core):
    """Per-pixel-table (fixed-gaze foveated) scorer: Pallas interpret vs the
    jnp rule, odd sizes exercising row/column padding."""
    p = core.params
    rng = np.random.RandomState(3)
    F, h, w = 3, 37, 200
    band = jnp.asarray(rng.randn(F, 4, h, w).astype(np.float32) * 0.05)
    L = jnp.asarray((10.0 ** rng.uniform(-1, 2.3, (F, h, w)))
                    .astype(np.float32))
    n = core.luts[0]["S_log"].shape[0]
    tabs_s = jnp.asarray(rng.uniform(-5, 10, (n, h, w)).astype(np.float32))
    tabs_t = tabs_s + jnp.asarray(
        rng.uniform(-1, 1, (n, h, w)).astype(np.float32))
    corr = 10.0 ** (p["sensitivity_correction"] / 20)
    args = (band[:, 0], band[:, 1], band[:, 2], band[:, 3], L, tabs_s, tabs_t)
    Y_log = np.asarray(core.luts[0]["Y_log"])
    Y = np.asarray(core.luts[0]["Y"])
    meta2 = (float(Y_log[0]), float((Y_log[-1] - Y_log[0]) / (n - 1)),
             float(Y[0]), float(Y[-1]), float(p["mask_p"]),
             float(p["mask_q_sust"]), float(p["mask_q_trans"]),
             float(10.0 ** p["mask_c"]), float(corr), float(p["beta"]))
    with cfg.forced(True, interpret=True):
        got = np.asarray(bs.band_score2_fov_pallas(
            band, L, tabs_s, tabs_t, core.luts[0], p["mask_p"],
            p["mask_q_sust"], p["mask_q_trans"], p["mask_c"], corr,
            p["beta"]))
        want = np.asarray(bs._band_score2_fov_jnp(*args, meta2))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)
        # gradient rule wires through the jnp composition
        import jax
        g = jax.grad(lambda b: jnp.sum(bs.band_score2_fov_pallas(
            b, L, tabs_s, tabs_t, core.luts[0], p["mask_p"], p["mask_q_sust"],
            p["mask_q_trans"], p["mask_c"], corr, p["beta"])))(band)
        assert np.isfinite(np.asarray(g)).all()


def test_foveated_fixed_gaze_fused_matches_jnp():
    """End-to-end: the fixed-gaze foveated path with the fused per-pixel
    scorer (interpret mode) equals the plain jnp composition."""
    import __graft_entry__ as ge
    rng = np.random.RandomState(9)
    H, W = 96, 160
    T = (rng.rand(2, H, W).astype(np.float32) * 120 + 0.2)
    R = np.clip(T + rng.randn(2, H, W).astype(np.float32) * 2, 0.1, None)
    from fovvideovdp_tpu.ops import temporal as temporal_ops
    fl = temporal_ops.filter_len_for_fps(30.0)
    filt = temporal_ops.temporal_filters(30.0, fl)
    pad_t = jnp.asarray(np.concatenate([np.repeat(T[:1], fl - 1, 0), T]))
    pad_r = jnp.asarray(np.concatenate([np.repeat(R[:1], fl - 1, 0), R]))

    core_f = ge._make_core(W, H, foveated=True)
    Q_jnp, _ = core_f.video_block_fn(filt, static_gaze=(40.0, 30.0))(
        pad_t, pad_r)
    with cfg.forced(True, interpret=True):
        core_p = ge._make_core(W, H, foveated=True)
        Q_pal, _ = core_p.video_block_fn(filt, static_gaze=(40.0, 30.0))(
            pad_t, pad_r)
    np.testing.assert_allclose(np.asarray(Q_pal), np.asarray(Q_jnp),
                               rtol=5e-4, atol=1e-6)
