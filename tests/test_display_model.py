"""Display photometry/geometry parity tests against reference goldens."""
import numpy as np
import jax.numpy as jnp
import pytest

from fovvideovdp_tpu.display_model import (fvvdp_display_photometry,
                                           fvvdp_display_geometry,
                                           fvvdp_display_photo_absolute)

DISPLAYS = ["standard_4k", "standard_fhd", "standard_hdr_pq",
            "standard_hdr_linear", "htc_vive_pro", "standard_hmd"]


@pytest.mark.parametrize("disp", DISPLAYS)
def test_photometry_eotf(goldens, disp):
    g = goldens("display_models")
    pm = fvvdp_display_photometry.load(disp)
    L = np.asarray(pm.forward(jnp.asarray(g["V"])))
    np.testing.assert_allclose(L, g[f"{disp}_L"], rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(pm.get_black_level(), g[f"{disp}_black"], rtol=1e-6)


@pytest.mark.parametrize("disp", DISPLAYS)
def test_geometry_ppd(goldens, disp):
    g = goldens("display_models")
    gm = fvvdp_display_geometry.load(disp)
    np.testing.assert_allclose(gm.get_ppd(), g[f"{disp}_ppd"], rtol=1e-6)


def test_geometry_foveation_maps(goldens):
    g = goldens("geometry_maps")
    gm = fvvdp_display_geometry.load("htc_vive_pro")
    w_band, h_band = int(g["w_band"]), int(g["h_band"])
    xv = np.linspace(0.5, w_band - 0.5, w_band, dtype=np.float32)
    yv = np.linspace(0.5, h_band - 0.5, h_band, dtype=np.float32)
    xx, yy = np.meshgrid(xv, yv)
    view_dir = np.asarray(gm.pix2view_direction((w_band, h_band),
                                                jnp.asarray(xx), jnp.asarray(yy)))
    np.testing.assert_allclose(view_dir, g["view_dir"], rtol=1e-4, atol=1e-4)
    res_mag = np.asarray(gm.get_resolution_magnification(jnp.asarray(view_dir)))
    np.testing.assert_allclose(res_mag, g["res_mag"], rtol=1e-4, atol=1e-4)
    ppd_map = np.asarray(gm.get_ppd(jnp.asarray(view_dir)))
    np.testing.assert_allclose(ppd_map, g["ppd_map"], rtol=1e-4, atol=1e-3)


def test_absolute_photometry():
    pm = fvvdp_display_photo_absolute(L_max=4000)
    x = jnp.asarray([0.001, 1.0, 5000.0])
    np.testing.assert_allclose(np.asarray(pm.forward(x)), [0.005, 1.0, 4000.0])


def test_fixed_ppd_geometry():
    # MATLAB-only construction path (fvvdp_display_geometry.m:101-106)
    gm = fvvdp_display_geometry((1920, 1080), pix_per_deg=42.0)
    assert gm.get_ppd() == 42.0
    vd = gm.pix2view_direction((192, 108), jnp.zeros((4, 4)), jnp.zeros((4, 4)))
    mag = np.asarray(gm.get_resolution_magnification(vd))
    np.testing.assert_allclose(mag, np.ones((4, 4)))
