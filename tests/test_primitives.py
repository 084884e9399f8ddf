"""Unit tests for numeric primitives against reference-generated goldens."""
import numpy as np
import jax.numpy as jnp

from fovvideovdp_tpu.ops.interp import interp1, interp3
from fovvideovdp_tpu.ops.temporal import (temporal_filters, filter_len_for_fps,
                                          padding_indices, apply_temporal_filters)
from fovvideovdp_tpu.utils import PU


def test_interp3_matches_reference(goldens):
    g = goldens("interp3")
    out = interp3(jnp.asarray(g["x"]), jnp.asarray(g["x"]), jnp.asarray(g["x"]),
                  jnp.asarray(g["v"]), jnp.asarray(g["xq"]), jnp.asarray(g["yq"]),
                  jnp.asarray(g["zq"]))
    np.testing.assert_allclose(np.asarray(out), g["out"], rtol=1e-5, atol=1e-6)


def test_interp3_hand_grid():
    # the reference's own self-test grid (pyfvvdp/interp.py:72-99)
    x = jnp.array([1.0, 2.0, 3.0])
    v = jnp.array([
        [[10.0, 20.0, 30.0], [15.0, 30.0, 45.0], [20.0, 40.0, 60.0]],
        [[100.0, 200.0, 300.0], [150.0, 300.0, 450.0], [200.0, 400.0, 600.0]],
        [[1000.0, 2000.0, 3000.0], [1500.0, 3000.0, 4500.0], [2000.0, 4000.0, 6000.0]],
    ])
    x_q = jnp.array([0.5, 1.9, 2.1])
    y_q = jnp.array([2.0, 2.0, 2.0])
    z_q = jnp.array([1.5, 2.0, 2.0])
    out = np.asarray(interp3(x, x, x, v, x_q, y_q, z_q))
    # x_q=0.5 below grid -> clamps to x=1, y=2, z=1.5: 0.5*(100+150)... v[y=2,x=1,z]
    # value computed from the trilinear formula directly:
    assert np.isfinite(out).all()
    # interior point check (x=1.9, y=2, z=2): between v[1,0,1]=200 and v[1,1,1]=300
    frac = (1.9 - 1.0) / (2.0 - 1.0 + 1e-6)
    expected = 200 * (1 - frac) + 300 * frac
    np.testing.assert_allclose(out[1], expected, rtol=1e-5)


def test_interp1_basic():
    x = jnp.array([0.0, 1.0, 2.0])
    v = jnp.array([0.0, 10.0, 40.0])
    q = jnp.array([-1.0, 0.5, 1.5, 3.0])
    out = np.asarray(interp1(x, v, q))
    # Reference semantics (pyfvvdp/interp.py:11-20): clamp below the grid,
    # linear extrapolation above it (callers pre-clamp their queries).
    np.testing.assert_allclose(out, [0.0, 5.0, 25.0, 70.0], rtol=1e-4, atol=1e-5)


def test_temporal_filters_match_reference(goldens):
    g = goldens("temporal_filters")
    for fps in [24, 30, 50, 60, 90, 120]:
        fl = filter_len_for_fps(fps)
        assert fl == int(g[f"fl_{fps}"])
        F = temporal_filters(fps, fl)
        np.testing.assert_allclose(F, g[f"F_{fps}"], rtol=1e-5, atol=1e-7,
                                   err_msg=f"fps={fps}")


def test_padding_indices_modes():
    N, fl = 12, 8
    for mode in ["replicate", "circular", "pingpong"]:
        idx = padding_indices(N, fl, mode)
        assert len(idx) == N + fl - 1
        assert idx.min() >= 0 and idx.max() < N
    rep = padding_indices(N, fl, "replicate")
    np.testing.assert_array_equal(rep[:fl], [0] * fl)
    np.testing.assert_array_equal(rep[fl - 1:], np.arange(N))


def test_apply_temporal_filters_is_causal_conv():
    rng = np.random.RandomState(0)
    fl, n_out = 5, 7
    F = rng.rand(2, fl).astype(np.float32)
    seq = rng.rand(n_out + fl - 1, 3, 4).astype(np.float32)
    out = np.asarray(apply_temporal_filters(jnp.asarray(seq), jnp.asarray(F)))
    assert out.shape == (n_out, 2, 3, 4)
    # brute-force check
    for f in range(n_out):
        for c in range(2):
            expected = sum(F[c, j] * seq[f + fl - 1 - j] for j in range(fl))
            np.testing.assert_allclose(out[f, c], expected, rtol=1e-5, atol=1e-6)


def test_pu_transform(goldens):
    g = goldens("pu_transform")
    pu = PU()
    V = np.asarray(pu.encode(jnp.asarray(g["Y"])))
    # fp32 pow() rounding differs slightly between XLA and torch; the PU curve
    # crosses zero near L_min so use an absolute tolerance there.
    np.testing.assert_allclose(V, g["V"], rtol=1e-4, atol=5e-3)
    np.testing.assert_allclose(pu.peak, g["peak"], rtol=1e-6)
    # round trip
    Y2 = np.asarray(pu.decode(jnp.asarray(V)))
    np.testing.assert_allclose(Y2, np.clip(g["Y"], pu.L_min, pu.L_max), rtol=5e-3)


def test_platform_info_string():
    """platform_info (the cpuinfo-replacement benchmark printout) returns a
    one-line host + accelerator description on any backend."""
    from fovvideovdp_tpu.utils import platform_info
    s = platform_info()
    assert isinstance(s, str) and "|" in s and "\n" not in s
