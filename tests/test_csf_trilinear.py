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
