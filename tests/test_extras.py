"""Tests for auxiliary components: preference mapping, 360 content mapping,
visualization primitives, config resolution."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from fovvideovdp_tpu.preference import fvvdp_preference
from fovvideovdp_tpu.content_mapping import fvvdp_content_mapping_equirect
from fovvideovdp_tpu.visualize import visualize_diff_map, vis_tonemap
from fovvideovdp_tpu import utils


def test_preference_mapping():
    # 0 JOD difference -> 50%; matlab/fvvdp_preference.m: sigma=1.4826
    np.testing.assert_allclose(float(fvvdp_preference(0.0)), 50.0, atol=1e-4)
    # 1 JOD -> 75% by the JOD definition
    np.testing.assert_allclose(float(fvvdp_preference(1.0)), 75.0, atol=0.5)
    # antisymmetric
    p = float(fvvdp_preference(2.5))
    np.testing.assert_allclose(p + float(fvvdp_preference(-2.5)), 100.0, atol=1e-3)


def test_equirect_eccentricity():
    cm = fvvdp_content_mapping_equirect(360, 180)
    xx, yy = np.meshgrid(np.arange(360, dtype=np.float32),
                         np.arange(180, dtype=np.float32))
    # gaze at image centre
    ecc = np.asarray(cm.eccentricity((360, 180), jnp.asarray(xx), jnp.asarray(yy),
                                     180.0, 90.0))
    assert ecc.shape == (180, 360)
    assert ecc[90, 180] < 1.0            # at gaze -> ~0 deg
    assert abs(ecc[90, 0] - 180.0) < 2.0  # opposite azimuth -> ~180 deg
    assert abs(ecc[0, 180] - 90.0) < 2.0  # pole is 90 deg from equator gaze


def test_vis_tonemap_ranges():
    rng = np.random.RandomState(0)
    b = jnp.asarray(rng.rand(32, 48).astype(np.float32) * 5)
    out = np.asarray(vis_tonemap(b, 0.6))
    assert out.min() >= 0.15 and out.max() <= 0.85


def test_visualize_diff_map_shapes():
    rng = np.random.RandomState(0)
    d = jnp.asarray(rng.rand(1, 24, 32).astype(np.float32))
    ctx = jnp.asarray(rng.rand(1, 24, 32).astype(np.float32) * 100 + 1)
    for cm in ["threshold", "supra-threshold", "monochromatic"]:
        out = np.asarray(visualize_diff_map(d, ctx, cm))
        assert out.shape == (3, 24, 32)
        assert out.min() >= 0 and out.max() <= 1


def test_config_dir_precedence(tmp_path, monkeypatch):
    # explicit dir > env var > packaged
    custom = tmp_path / "cfg"
    custom.mkdir()
    (custom / "fvvdp_parameters.json").write_text('{"mask_p": 1.0}')
    envdir = tmp_path / "env"
    envdir.mkdir()
    (envdir / "fvvdp_parameters.json").write_text('{"mask_p": 2.0}')

    monkeypatch.setenv("FVVDP_PATH", str(envdir))
    utils.config_files.set_config_dir(str(custom))
    try:
        assert utils.config_files.find("fvvdp_parameters.json") == \
            str(custom / "fvvdp_parameters.json")
        utils.config_files.set_config_dir(None)
        assert utils.config_files.find("fvvdp_parameters.json") == \
            str(envdir / "fvvdp_parameters.json")
        monkeypatch.delenv("FVVDP_PATH")
        assert "fovvideovdp_tpu" in utils.config_files.find("fvvdp_parameters.json")
    finally:
        utils.config_files.set_config_dir(None)


def test_gog_photometry():
    from fovvideovdp_tpu.display_model import fvvdp_display_photo_gog
    gog = fvvdp_display_photo_gog(100, contrast=1000, gamma=2.2)
    L = np.asarray(gog.forward(jnp.asarray([0.0, 0.5, 1.0])))
    assert abs(L[0] - gog.get_black_level()) < 1e-5
    assert abs(L[2] - 100.0) < 1e-3
    srgb = fvvdp_display_photo_gog(100, gamma=-1)
    L2 = np.asarray(srgb.forward(jnp.asarray([0.5])))
    assert 18 < L2[0] < 25  # sRGB 0.5 -> ~21% linear


def test_odd_sizes_and_dtypes():
    """Odd/small resolutions and every documented input dtype must score
    finite JODs — including float16, which the reference's dtype check
    rejects despite its docstring (SURVEY.md section 7 'quirks')."""
    from fovvideovdp_tpu import fvvdp

    rng = np.random.RandomState(0)
    fv = fvvdp(display_name="standard_fhd")
    for (H, W) in [(17, 33), (64, 31), (16, 16)]:
        ref = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        tst = np.clip(ref.astype(np.int16) + rng.randint(-20, 20, ref.shape),
                      0, 255).astype(np.uint8)
        q, _ = fv.predict(tst, ref, dim_order="HWC")
        assert np.isfinite(q) and 0 <= q <= 10, (H, W, q)

    ref16 = rng.rand(32, 48, 3).astype(np.float16)
    tst16 = np.clip(ref16 + rng.randn(32, 48, 3).astype(np.float16) * 0.05,
                    0, 1).astype(np.float16)
    q, _ = fv.predict(tst16, ref16, dim_order="HWC")
    assert np.isfinite(q)

    g_r = rng.rand(5, 24, 40, 1).astype(np.float32)
    g_t = np.clip(g_r + rng.randn(5, 24, 40, 1).astype(np.float32) * 0.03,
                  0, 1)
    q, _ = fv.predict(g_t, g_r, dim_order="FHWC", frames_per_second=24)
    assert np.isfinite(q)


def test_fov_table_cache_bounded():
    """Per-gaze CSF tables are GB-scale at 4K; the cache must stay bounded
    and evicted gazes must rescore identically."""
    from fovvideovdp_tpu import fvvdp

    rng = np.random.RandomState(2)
    ref = (rng.rand(24, 32, 3) * 255).astype(np.uint8)
    tst = np.clip(ref.astype(np.int16) + rng.randint(-20, 20, ref.shape),
                  0, 255).astype(np.uint8)
    fv = fvvdp(display_name="standard_hmd", foveated=True)
    qs = {}
    for g in [(2.0, 2.0), (5.0, 5.0), (8.0, 8.0), (11.0, 3.0)]:
        q, _ = fv.predict(tst, ref, dim_order="HWC",
                          fixation_point=np.asarray(g, np.float32))
        qs[g] = q
    core = next(iter(fv._cores.values()))
    assert 0 < len(core._fov_table_cache) <= core._FOV_CACHE_ENTRIES
    q, _ = fv.predict(tst, ref, dim_order="HWC",
                      fixation_point=np.asarray((2.0, 2.0), np.float32))
    np.testing.assert_allclose(q, qs[(2.0, 2.0)], rtol=1e-6)


def test_jod_invariants():
    """Behavioral invariants: identical content scores exactly 10 JOD, and
    quality decreases monotonically with distortion strength."""
    from fovvideovdp_tpu import fvvdp

    rng = np.random.RandomState(4)
    ref = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    fv = fvvdp(display_name="standard_4k")

    q_same, _ = fv.predict(ref, ref, dim_order="HWC")
    np.testing.assert_allclose(q_same, 10.0, atol=1e-4)

    prev = 10.0
    for sigma in (4, 8, 16, 32):
        tst = np.clip(ref.astype(np.int16)
                      + rng.randint(-sigma, sigma + 1, ref.shape),
                      0, 255).astype(np.uint8)
        q, _ = fv.predict(tst, ref, dim_order="HWC")
        assert q < prev, f"sigma={sigma}: {q} !< {prev}"
        prev = q


def test_array_source_accepts_device_arrays():
    """jnp inputs stay on device (no host round-trip) and score identically
    to the same data passed as numpy."""
    import jax.numpy as jnp
    from fovvideovdp_tpu import fvvdp

    rng = np.random.RandomState(6)
    ref = (rng.rand(4, 24, 32, 3) * 255).astype(np.uint8)
    tst = np.clip(ref.astype(np.int16) + rng.randint(-20, 20, ref.shape),
                  0, 255).astype(np.uint8)
    fv = fvvdp(display_name="standard_fhd")
    q_np, _ = fv.predict(tst, ref, dim_order="FHWC", frames_per_second=30)
    q_dev, _ = fv.predict(jnp.asarray(tst), jnp.asarray(ref),
                          dim_order="FHWC", frames_per_second=30)
    np.testing.assert_allclose(q_dev, q_np, rtol=1e-6, atol=1e-6)
