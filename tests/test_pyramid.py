"""Laplacian / contrast pyramid parity tests (band-for-band vs reference)."""
import numpy as np
import jax.numpy as jnp
import pytest

from fovvideovdp_tpu.ops.pyramid import PyramidPlan, gausspyr_reduce, gausspyr_expand


@pytest.mark.parametrize("tag", ["even", "odd", "oddw"])
def test_pyramid_bands_match_reference(goldens, tag):
    g = goldens(f"pyramid_{tag}")
    img = jnp.asarray(g["img"])  # (4, 1, H, W)
    H, W = img.shape[-2:]
    plan = PyramidPlan(W, H, float(g["ppd"]))
    assert plan.height == int(g["height"])
    np.testing.assert_allclose(plan.get_freqs(), g["band_freqs"], rtol=1e-6)

    lbands, gbands = plan.decompose(img)
    for i in range(plan.height + 1):
        np.testing.assert_allclose(np.asarray(gbands[i]), g[f"gband_{i}"],
                                   rtol=1e-5, atol=1e-3, err_msg=f"gband {i}")
        np.testing.assert_allclose(np.asarray(lbands[i]), g[f"lband_{i}"],
                                   rtol=1e-5, atol=1e-3, err_msg=f"lband {i}")

    recon = plan.reconstruct(lbands)
    np.testing.assert_allclose(np.asarray(recon), g["recon"], rtol=1e-5, atol=1e-3)


@pytest.mark.parametrize("tag", ["even", "odd", "oddw"])
def test_contrast_pyramid_matches_reference(goldens, tag):
    g = goldens(f"pyramid_{tag}")
    img = jnp.asarray(g["img"])
    H, W = img.shape[-2:]
    plan = PyramidPlan(W, H, float(g["ppd"]))
    # golden generated with (C=4, 1, H, W) layout; bkg channel = index 1 of dim 0
    cbands, lbkg = plan.decompose_contrast(img.squeeze(1)[None],
                                           bkg_channel=1)
    # our layout: (1, C, h, w) per level; golden: (C, 1, h, w)
    for i in range(plan.height + 1):
        ours = np.asarray(cbands[i])[0][:, None]
        np.testing.assert_allclose(ours, g[f"cband_{i}"], rtol=2e-5, atol=1e-4,
                                   err_msg=f"cband {i}")
    for i in range(plan.height):
        ours = np.asarray(lbkg[i])[0][:, None]
        np.testing.assert_allclose(ours, g[f"lbkg_{i}"], rtol=1e-5, atol=1e-3,
                                   err_msg=f"lbkg {i}")


def test_reduce_expand_shapes():
    for H, W in [(64, 96), (67, 95), (5, 9)]:
        x = jnp.asarray(np.random.RandomState(0).rand(2, H, W).astype(np.float32))
        r = gausspyr_reduce(x)
        assert r.shape == (2, -(-H // 2), -(-W // 2))
        e = gausspyr_expand(r, (H, W))
        assert e.shape == (2, H, W)
