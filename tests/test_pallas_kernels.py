"""Pallas TPU kernels must match the jnp reference implementations.

These tests run on real TPU hardware; on CPU-only hosts they are skipped
(the jnp fallback is the path under test everywhere else in the suite).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp


def _tpu_device():
    try:
        devs = [d for d in jax.devices() if d.platform not in ("cpu",)]
    except Exception:
        devs = []
    if not devs:
        pytest.skip("no TPU device available")
    return devs[0]


@pytest.mark.parametrize("shape", [(2160, 3840), (67, 190), (270, 480)])
def test_pallas_reduce_matches_jnp(shape):
    dev = _tpu_device()
    from fovvideovdp_tpu.ops.pyramid import _gausspyr_reduce_jnp
    from fovvideovdp_tpu.ops.pallas.reduce import gausspyr_reduce_pallas, supports
    H, W = shape
    if not supports(H, W):
        pytest.skip("shape unsupported by the kernel")
    x = jax.device_put(
        jnp.asarray(np.random.RandomState(0).rand(2, H, W).astype(np.float32) * 100),
        dev)
    ref = np.asarray(jax.jit(_gausspyr_reduce_jnp)(x))
    got = np.asarray(jax.jit(gausspyr_reduce_pallas)(x))
    rel = np.abs(ref - got).max() / max(np.abs(ref).max(), 1.0)
    # the kernel contracts via the bf16x3 split (ops/pallas/mxu.py): ~2^-16
    # relative worst case; e2e JOD parity (±0.01) is asserted separately
    assert rel < 2e-5, f"rel err {rel}"


def test_pallas_band_score_matches_jnp():
    dev = _tpu_device()
    from fovvideovdp_tpu.ops.pallas import band_score as bs
    import __graft_entry__ as ge
    core = ge._make_core(256, 160)
    p = core.params
    rng = np.random.RandomState(0)
    T = jax.device_put(jnp.asarray(rng.randn(3, 160, 256).astype(np.float32)), dev)
    R = T + 0.03
    L = jax.device_put(jnp.asarray(
        (rng.rand(3, 160, 256) * 300 + 0.5).astype(np.float32)), dev)
    corr = 10.0 ** (p["sensitivity_correction"] / 20)
    tbl = core._band_tables[0][0]
    got = np.asarray(bs.band_score_pallas(
        T, R, L, tbl, core.luts[0], p["mask_p"], p["mask_q_sust"],
        p["mask_c"], corr, p["beta"]))
    meta = (float(np.asarray(core.luts[0]["Y_log"])[0]),
            float((np.asarray(core.luts[0]["Y_log"])[-1]
                   - np.asarray(core.luts[0]["Y_log"])[0]) / 31),
            float(np.asarray(core.luts[0]["Y"])[0]),
            float(np.asarray(core.luts[0]["Y"])[-1]),
            float(p["mask_p"]), float(p["mask_q_sust"]),
            float(10.0 ** p["mask_c"]), float(corr), float(p["beta"]))
    want = np.asarray(bs._band_score_jnp(T, R, L, jnp.asarray(tbl), meta))
    # the kernel evaluates masking in log2 space, the jnp reference in the
    # direct pow form — same math, different transcendental rounding on TPU
    np.testing.assert_allclose(got, want, rtol=5e-5)


def test_pallas_band_score2_matches_jnp():
    """Two-channel fused scorer == two single-channel jnp evaluations."""
    dev = _tpu_device()
    from fovvideovdp_tpu.ops.pallas import band_score as bs
    import __graft_entry__ as ge
    core = ge._make_core(256, 160)
    p = core.params
    rng = np.random.RandomState(3)
    band = jax.device_put(
        jnp.asarray(rng.randn(3, 4, 160, 256).astype(np.float32)), dev)
    L = jax.device_put(jnp.asarray(
        (rng.rand(3, 160, 256) * 300 + 0.5).astype(np.float32)), dev)
    corr = 10.0 ** (p["sensitivity_correction"] / 20)
    tabs = np.stack(core._band_tables[0][:2])
    got = np.asarray(bs.band_score2_pallas(
        band, L, tabs, core.luts[0], p["mask_p"], p["mask_q_sust"],
        p["mask_q_trans"], p["mask_c"], corr, p["beta"]))
    Y_log = np.asarray(core.luts[0]["Y_log"])
    Y = np.asarray(core.luts[0]["Y"])
    base = (float(Y_log[0]), float((Y_log[-1] - Y_log[0]) / 31),
            float(Y[0]), float(Y[-1]), float(p["mask_p"]))
    tail = (float(10.0 ** p["mask_c"]), float(corr), float(p["beta"]))
    want_s = np.asarray(bs._band_score_jnp(
        band[:, 0], band[:, 1], L, jnp.asarray(tabs[0]),
        base + (float(p["mask_q_sust"]),) + tail))
    want_t = np.asarray(bs._band_score_jnp(
        band[:, 2], band[:, 3], L, jnp.asarray(tabs[1]),
        base + (float(p["mask_q_trans"]),) + tail))
    # log2-space kernel vs direct-form jnp: see tolerance note above
    np.testing.assert_allclose(got, np.stack([want_s, want_t], -1), rtol=5e-5)


def test_pallas_temporal_matches_jnp():
    dev = _tpu_device()
    from fovvideovdp_tpu.ops import temporal as t
    from fovvideovdp_tpu.ops.pallas.temporal import temporal_channels_pallas
    rng = np.random.RandomState(0)
    F = t.temporal_filters(30.0, 8)
    pt = jax.device_put(
        jnp.asarray(rng.rand(13, 171, 300).astype(np.float32) * 120), dev)
    pr = jax.device_put(
        jnp.asarray(rng.rand(13, 171, 300).astype(np.float32) * 120), dev)
    got = np.asarray(temporal_channels_pallas(pt, pr, F))
    Rt = t.apply_temporal_filters(pt, jnp.asarray(F))
    Rr = t.apply_temporal_filters(pr, jnp.asarray(F))
    want = np.asarray(jnp.stack([Rt[:, 0], Rr[:, 0], Rt[:, 1], Rr[:, 1]],
                                axis=1))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)


def test_pallas_temporal_gradient():
    dev = _tpu_device()
    from fovvideovdp_tpu.ops import pallas as pallas_cfg
    from fovvideovdp_tpu.ops import temporal as t
    rng = np.random.RandomState(2)
    F = t.temporal_filters(30.0, 8)
    pt = jax.device_put(
        jnp.asarray(rng.rand(10, 64, 256).astype(np.float32) * 50), dev)
    pr = jax.device_put(
        jnp.asarray(rng.rand(10, 64, 256).astype(np.float32) * 50), dev)

    def loss(a, b):
        return jnp.sum(t.temporal_channels(a, b, F) ** 2)

    with pallas_cfg.forced(True):
        g1 = jax.grad(loss, argnums=(0, 1))(pt, pr)
    with pallas_cfg.forced(False):
        g2 = jax.grad(loss, argnums=(0, 1))(pt, pr)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def test_pallas_dispatch_gradient():
    """The custom-VJP wrapper must produce the same gradient as the jnp path."""
    dev = _tpu_device()
    from fovvideovdp_tpu.ops import pallas as pallas_cfg
    from fovvideovdp_tpu.ops.pyramid import (gausspyr_reduce,
                                             _gausspyr_reduce_jnp)
    x = jax.device_put(
        jnp.asarray(np.random.RandomState(1).rand(1, 144, 256).astype(np.float32)),
        dev)
    pallas_cfg.set_use_pallas(True)
    try:
        g1 = jax.grad(lambda v: jnp.sum(gausspyr_reduce(v) ** 2))(x)
    finally:
        pallas_cfg.set_use_pallas(None)
    g2 = jax.grad(lambda v: jnp.sum(_gausspyr_reduce_jnp(v) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4,
                               atol=1e-5)


def test_pallas_band_score2_fov_matches_jnp():
    """Per-pixel-table (fixed-gaze foveated) fused scorer on hardware."""
    dev = _tpu_device()
    from fovvideovdp_tpu.ops.pallas import band_score as bs
    import __graft_entry__ as ge
    core = ge._make_core(256, 160)
    p = core.params
    rng = np.random.RandomState(5)
    F, h, w = 3, 150, 250   # pads both tile axes
    band = jax.device_put(
        jnp.asarray(rng.randn(F, 4, h, w).astype(np.float32) * 0.05), dev)
    L = jax.device_put(jnp.asarray(
        (10.0 ** rng.uniform(-1, 2.3, (F, h, w))).astype(np.float32)), dev)
    n = core.luts[0]["S_log"].shape[0]
    tabs_s = jax.device_put(jnp.asarray(
        rng.uniform(-5, 10, (n, h, w)).astype(np.float32)), dev)
    tabs_t = tabs_s + jax.device_put(jnp.asarray(
        rng.uniform(-1, 1, (n, h, w)).astype(np.float32)), dev)
    corr = 10.0 ** (p["sensitivity_correction"] / 20)
    got = np.asarray(bs.band_score2_fov_pallas(
        band, L, tabs_s, tabs_t, core.luts[0], p["mask_p"], p["mask_q_sust"],
        p["mask_q_trans"], p["mask_c"], corr, p["beta"]))
    Y_log = np.asarray(core.luts[0]["Y_log"])
    Y = np.asarray(core.luts[0]["Y"])
    meta2 = (float(Y_log[0]), float((Y_log[-1] - Y_log[0]) / (n - 1)),
             float(Y[0]), float(Y[-1]), float(p["mask_p"]),
             float(p["mask_q_sust"]), float(p["mask_q_trans"]),
             float(10.0 ** p["mask_c"]), float(corr), float(p["beta"]))
    want = np.asarray(bs._band_score2_fov_jnp(
        band[:, 0], band[:, 1], band[:, 2], band[:, 3], L, tabs_s, tabs_t,
        meta2))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_pallas_mov_score_matches_jnp():
    """Moving-gaze in-kernel trilinear scorer on hardware (nested dynamic
    knot-window loops + SMEM LUT — the Mosaic-lowering risk surface)."""
    dev = _tpu_device()
    from fovvideovdp_tpu.ops.pallas import mov_score as ms
    import __graft_entry__ as ge
    core = ge._make_core(256, 160, foveated=True)
    p = core.params
    rng = np.random.RandomState(9)
    bb = 0
    h, w = core.plan.level_shapes[bb]
    F = 3
    band = jax.device_put(
        jnp.asarray(rng.randn(F, 4, h, w).astype(np.float32) * 0.05), dev)
    L = jax.device_put(jnp.asarray(
        (10.0 ** rng.uniform(-1, 2.3, (F, h, w))).astype(np.float32)), dev)
    gaze_px = np.stack([np.linspace(5, w - 5, F),
                        np.linspace(5, h - 5, F)], axis=1)
    gaze_dir = jnp.transpose(core._gaze_directions(
        jnp.asarray(gaze_px, dtype=jnp.float32)))
    corr = 10.0 ** (p["sensitivity_correction"] / 20)
    args = (band, L, core._moving_band_data(bb), core._band_view_dir[bb],
            gaze_dir, core.luts[0], core._fov_lut or core.luts[0],
            p["mask_p"], p["mask_q_sust"], p["mask_q_trans"], p["mask_c"],
            corr, p["beta"])
    got = np.asarray(ms.band_score2_mov_pallas(*args))
    want = np.asarray(ms.band_score2_mov_jnp(*args))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)
