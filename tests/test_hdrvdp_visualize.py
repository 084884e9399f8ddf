"""Tests for the full hdrvdp_visualize port (pmap/diff/civdm, print target)."""
import numpy as np
import jax.numpy as jnp

from fovvideovdp_tpu.hdrvdp_visualize import (norm_diff_img, visualize_civdm,
                                              visualize_diff, visualize_pmap)


def _prob_map():
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.rand(24, 32).astype(np.float32))


def _context():
    rng = np.random.RandomState(1)
    return jnp.asarray((rng.rand(24, 32, 3) * 100 + 1).astype(np.float32))


def test_pmap_all_modes():
    P = _prob_map()
    ctx = _context()
    for cm in ["trichromatic", "dichromatic", "monochromatic"]:
        for target in ["screen", "print"]:
            out = np.asarray(visualize_pmap(P, ctx, target=target, colormap=cm))
            assert out.shape == (24, 32, 3)
            assert out.min() >= 0 and out.max() <= 1
    # no context image -> flat gray background
    out = np.asarray(visualize_pmap(P))
    assert out.shape == (24, 32, 3)


def test_pmap_colormap_endpoints():
    # P=0 -> blue-ish, P=1 -> red-ish (trichromatic on flat background)
    P = jnp.asarray(np.array([[0.0, 1.0]], np.float32))
    out = np.asarray(visualize_pmap(P))
    assert out[0, 0, 2] > out[0, 0, 0]  # blue end
    assert out[0, 1, 0] > out[0, 1, 2]  # red end


def test_norm_diff_and_visualize_diff():
    rng = np.random.RandomState(2)
    ref = jnp.asarray((rng.rand(24, 32) * 100).astype(np.float32))
    tst = ref + 5.0
    nd = np.asarray(norm_diff_img(tst, ref))
    assert nd.shape == (24, 32) and nd.max() <= 1.0
    out = np.asarray(visualize_diff(_prob_map(), tst, ref, _context()))
    assert out.shape == (24, 32, 3)


def test_civdm_strongest_distortion_wins():
    rng = np.random.RandomState(3)
    loss = jnp.asarray(rng.rand(16, 16).astype(np.float32))
    ampl = jnp.asarray(rng.rand(16, 16).astype(np.float32))
    rev = jnp.asarray(rng.rand(16, 16).astype(np.float32))
    out = np.asarray(visualize_civdm(loss, ampl, rev))
    assert out.shape == (16, 16, 3)
    # only the strongest channel is non-zero at each pixel
    nonzero = (out > 0).sum(axis=-1)
    assert (nonzero <= 1).all()
    ctx16 = jnp.asarray((np.random.RandomState(4).rand(16, 16) * 100 + 1)
                        .astype(np.float32))
    out_ctx = np.asarray(visualize_civdm(loss, ampl, rev, ctx16))
    assert out_ctx.min() >= 0 and out_ctx.max() <= 1
