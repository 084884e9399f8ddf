"""Content geometry mappings for non-flat content: 360 equirectangular video.

Port of matlab/fvvdp_content_mapping.m:12-28 — computes the angular distance
(eccentricity, deg) between every pixel of an equirectangular frame and a
gaze position, using spherical geometry.  Used with
``fvvdp(..., foveated=True)`` through the ``content_mapping`` hook
(matlab/fvvdp_core.m:318-340 sketches the integration; the MATLAB geometry
branch raises "Not implemented" — this implementation completes it for the
equirectangular case).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class fvvdp_content_mapping_equirect:
    """Equirectangular 360 content: pixel -> direction on the unit sphere."""

    def __init__(self, width: int, height: int):
        self.width = width
        self.height = height

    def _angles(self, x_pix, y_pix, resolution_pix):
        """Pixel coords -> (azimuth, elevation) in radians."""
        res_w, res_h = float(resolution_pix[0]), float(resolution_pix[1])
        azimuth = (x_pix / res_w - 0.5) * 2.0 * jnp.pi
        elevation = (0.5 - y_pix / res_h) * jnp.pi
        return azimuth, elevation

    def eccentricity(self, resolution_pix, x_pix, y_pix, gaze_x, gaze_y):
        """Angular distance (deg) between each pixel and the gaze point.

        ``resolution_pix`` is (width, height) of the (sub-band) image; gaze
        coordinates are in full-frame pixels."""
        az, el = self._angles(x_pix, y_pix, resolution_pix)
        g_az, g_el = self._angles(gaze_x, gaze_y, (self.width, self.height))
        # great-circle distance
        cos_d = (jnp.sin(el) * jnp.sin(g_el)
                 + jnp.cos(el) * jnp.cos(g_el) * jnp.cos(az - g_az))
        return jnp.rad2deg(jnp.arccos(jnp.clip(cos_d, -1.0, 1.0)))
