"""CSF LUT lookup + analytic generator tests."""
import numpy as np
import jax.numpy as jnp

from fovvideovdp_tpu.csf import CSFCache, sensitivity, cache_key


def test_cache_key_format():
    assert cache_key(0, -1.5, 0.604562) == "o0_sn1_5_cm0_604562"
    assert cache_key(5, -1.5, 0.604562) == "o5_sn1_5_cm0_604562"


def test_lut_sensitivity_matches_reference(goldens):
    g = goldens("csf_lut")
    cache = CSFCache()
    for omega in [0, 5]:
        lut = cache.get(omega, -1.5, 0.604562)
        S = np.asarray(sensitivity(lut, jnp.asarray(g["rho"]), jnp.asarray(g["L"]),
                                   jnp.asarray(g["ecc"])))
        np.testing.assert_allclose(S, g[f"S_omega{omega}"], rtol=2e-4, atol=1e-5,
                                   err_msg=f"omega={omega}")


def test_generator_reproduces_shipped_luts():
    from fovvideovdp_tpu import csf_generator
    import os
    data_dir = os.path.join(os.path.dirname(csf_generator.__file__), "data")
    for omega in [0, 5]:
        lut = csf_generator.precompute_lut(omega, -1.5, 0.604562)
        ref = np.load(os.path.join(data_dir, f"csf_lut_o{omega}_sn1_5_cm0_604562.npz"))
        np.testing.assert_allclose(lut["Y"], ref["Y"], rtol=1e-6)
        np.testing.assert_allclose(lut["rho"], ref["rho"], rtol=1e-6)
        np.testing.assert_allclose(lut["ecc"], ref["ecc"], rtol=1e-6)
        # float32 forward-model noise; 1e-3 in log2 domain ~ 0.07% sensitivity
        assert np.abs(lut["S_log"] - ref["S_log"]).max() < 2e-3


def test_generator_new_key_runs():
    # A key the reference cannot produce from Python at all.
    from fovvideovdp_tpu import csf_generator
    lut = csf_generator.precompute_lut(10.0, -1.5, 0.604562, n=8)
    assert lut["S_log"].shape == (8, 8, 8)
    assert np.isfinite(lut["S_log"]).all()
