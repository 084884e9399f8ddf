"""Unit parity for the moving-gaze in-kernel trilinear scorer
(ops/pallas/mov_score.py): kernel (interpret mode) vs its 8-corner-gather
jnp composition, vs the per-frame MXU table collapse it replaces, and a
gradient smoke through the custom VJP.  Hardware lowering is covered by
tests/test_pallas_kernels.py (pytest -m tpu)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fovvideovdp_tpu.ops import pallas as cfg
from fovvideovdp_tpu.ops.pallas import band_score as bs
from fovvideovdp_tpu.ops.pallas import mov_score as ms


@pytest.fixture(scope="module")
def core():
    import __graft_entry__ as ge
    return ge._make_core(256, 64, foveated=True)


def _mov_inputs(core, bb=0, F=3, seed=0):
    rng = np.random.RandomState(seed)
    h, w = core.plan.level_shapes[bb]
    band = jnp.asarray(rng.randn(F, 4, h, w).astype(np.float32) * 0.05)
    L = jnp.asarray((rng.rand(F, h, w) * 80 + 0.5).astype(np.float32))
    gaze_px = np.stack([np.linspace(5, w - 5, F),
                        np.linspace(5, h - 5, F)], axis=1)
    gaze_dir = jnp.transpose(core._gaze_directions(jnp.asarray(
        gaze_px, dtype=jnp.float32)))                      # (F, 2)
    return band, L, gaze_dir


def _score(core, bb, band, L, gaze_dir, fn=None):
    p = core.params
    corr = 10.0 ** (p["sensitivity_correction"] / 20)
    return (fn or ms.band_score2_mov_pallas)(
        band, L, core._moving_band_data(bb), core._band_view_dir[bb],
        gaze_dir, core.luts[0], core._fov_lut or core.luts[0],
        p["mask_p"], p["mask_q_sust"], p["mask_q_trans"], p["mask_c"],
        corr, p["beta"])


def test_mov_kernel_matches_jnp_composition(core):
    band, L, gaze_dir = _mov_inputs(core)
    bb = 0
    with cfg.forced(True, interpret=True):
        got = np.asarray(_score(core, bb, band, L, gaze_dir))
    want = np.asarray(_score(core, bb, band, L, gaze_dir,
                             fn=ms.band_score2_mov_jnp))
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=1e-6)


def test_mov_kernel_matches_table_collapse(core):
    """In-kernel trilinear == the per-frame MXU table collapse feeding the
    fixed-gaze per-pixel-table kernel (the path it replaces)."""
    p = core.params
    corr = 10.0 ** (p["sensitivity_correction"] / 20)
    bb = 1
    band, L, gaze_dir = _mov_inputs(core, bb=bb, seed=3)
    with cfg.forced(True, interpret=True):
        got = np.asarray(_score(core, bb, band, L, gaze_dir))
    vd = core._band_view_dir[bb]
    kern_lut = core._fov_lut or core.luts[0]
    want = []
    for f in range(band.shape[0]):
        ecc = jnp.sqrt(jnp.sum(
            (vd - gaze_dir[f][:, None, None]) ** 2, axis=0))
        tab_s, tab_t = core._mov_tables_for_frame(bb, ecc)
        with cfg.forced(True, interpret=True):
            want.append(np.asarray(bs.band_score2_fov_pallas(
                band[f:f + 1], L[f:f + 1], tab_s, tab_t, kern_lut,
                p["mask_p"], p["mask_q_sust"], p["mask_q_trans"],
                p["mask_c"], corr, p["beta"]))[0])
    np.testing.assert_allclose(got, np.stack(want), rtol=2e-4, atol=1e-5)


def test_mov_kernel_nonaligned_shapes(core):
    """Fringe tiles (h, w not multiples of the tile shape) pad exactly:
    band zeros score exactly 0 and edge-padded planes keep windows tight."""
    bb = 2   # 16x64 at the 256x64 plan -> well below one full tile
    h, w = core.plan.level_shapes[bb]
    if not ms.supports(h, w):
        pytest.skip(f"level {bb} ({h}x{w}) below kernel minimum")
    band, L, gaze_dir = _mov_inputs(core, bb=bb, seed=7)
    with cfg.forced(True, interpret=True):
        got = np.asarray(_score(core, bb, band, L, gaze_dir))
    want = np.asarray(_score(core, bb, band, L, gaze_dir,
                             fn=ms.band_score2_mov_jnp))
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=1e-6)


def test_mov_kernel_gradient(core):
    """custom VJP: gradient flows to the band, L_bkg and the gaze."""
    band, L, gaze_dir = _mov_inputs(core, F=2)

    def loss(b, Lb, g):
        with cfg.forced(True, interpret=True):
            return jnp.sum(_score(core, 0, b, Lb, g))

    gb, gL, gg = jax.grad(loss, argnums=(0, 1, 2))(band, L, gaze_dir)
    assert np.isfinite(np.asarray(gb)).all()
    assert np.isfinite(np.asarray(gL)).all()
    assert np.isfinite(np.asarray(gg)).all()
    assert float(jnp.abs(gb).max()) > 0.0
