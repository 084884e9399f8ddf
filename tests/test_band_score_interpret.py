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
