"""The gather-free trilinear CSF path must match the reference-semantics
interp3 path (used for the foveated mode)."""
import numpy as np
import jax.numpy as jnp

from fovvideovdp_tpu.csf import CSFCache, sensitivity, sensitivity_trilinear


def test_trilinear_matches_interp3(goldens):
    g = goldens("csf_lut")
    cache = CSFCache()
    for omega in [0, 5]:
        lut = cache.get(omega, -1.5, 0.604562)
        rho = jnp.asarray(g["rho"])
        L = jnp.asarray(g["L"])
        ecc = jnp.asarray(g["ecc"])
        S_ref = np.asarray(sensitivity(lut, rho, L, ecc))
        S_new = np.asarray(sensitivity_trilinear(lut, rho, L, ecc))
        np.testing.assert_allclose(S_new, S_ref, rtol=5e-5, atol=1e-6)
        # and against the reference-generated golden
        np.testing.assert_allclose(S_new, g[f"S_omega{omega}"], rtol=3e-4,
                                   atol=1e-5)


def test_trilinear_scalar_broadcast():
    cache = CSFCache()
    lut = cache.get(0, -1.5, 0.604562)
    L = jnp.asarray(np.random.RandomState(0).rand(7, 33) * 100 + 0.5)
    S_a = np.asarray(sensitivity_trilinear(lut, 2.0, L, 0.0))
    S_b = np.asarray(sensitivity(lut, 2.0, L, 0.0))
    np.testing.assert_allclose(S_a, S_b, rtol=5e-5)
    assert S_a.shape == (7, 33)


def test_trilinear_block_matches_per_frame():
    """The block-amortised moving-gaze path (rho collapsed once, frames
    reusing it) must equal the per-frame trilinear exactly up to fp
    reassociation."""
    from fovvideovdp_tpu.csf import sensitivity_trilinear_block
    rng = np.random.RandomState(7)
    cache = CSFCache()
    F, h, w = 5, 19, 23
    rho_map = jnp.asarray(2.0 ** rng.uniform(-3, 6, (h, w)).astype(np.float32))
    L = jnp.asarray(10.0 ** rng.uniform(-3, 4, (F, h, w)).astype(np.float32))
    ecc = jnp.asarray(rng.uniform(0, 120, (F, h, w)).astype(np.float32))
    for omega in [0, 5]:
        lut = cache.get(omega, -1.5, 0.604562)
        S_blk = np.asarray(sensitivity_trilinear_block(lut, rho_map, L, ecc))
        S_ref = np.stack([np.asarray(sensitivity_trilinear(
            lut, rho_map, L[f], ecc[f])) for f in range(F)])
        np.testing.assert_allclose(S_blk, S_ref, rtol=5e-5, atol=1e-6)
    # ecc broadcast over frames, padding path (h*w below one chunk is fine;
    # force multiple chunks with a larger map)
    h2, w2 = 70, 131
    rho2 = jnp.asarray(2.0 ** rng.uniform(-3, 6, (h2, w2)).astype(np.float32))
    L2 = jnp.asarray(10.0 ** rng.uniform(-2, 3, (3, h2, w2)).astype(np.float32))
    ecc2 = jnp.asarray(rng.uniform(0, 100, (h2, w2)).astype(np.float32))
    lut = cache.get(0, -1.5, 0.604562)
    S_blk = np.asarray(sensitivity_trilinear_block(lut, rho2, L2, ecc2))
    S_ref = np.stack([np.asarray(sensitivity_trilinear(lut, rho2, L2[f], ecc2))
                      for f in range(3)])
    np.testing.assert_allclose(S_blk, S_ref, rtol=5e-5, atol=1e-6)
