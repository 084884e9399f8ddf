"""Display photometry (EOTF -> absolute luminance) and geometry (pixels-per-
degree, view directions, foveated resolution magnification).

Functional parity with the reference display models
(pyfvvdp/fvvdp_display_model.py:21-570; MATLAB extras
matlab/fvvdp_display_geometry.m:77-106), implemented once and in JAX:

* photometry: sRGB / gamma / PQ / linear EOTFs with ambient-reflection black
  level (fvvdp_display_model.py:114-176), absolute mode (191-213), deprecated
  GOG model (231-302).
* geometry: central ppd, off-axis ppd magnification, pixel->view-direction
  (fvvdp_display_model.py:383-526), plus the MATLAB-only ``pix_per_deg``
  fixed-ppd construction (fvvdp_display_geometry.m:101-106).
"""
from __future__ import annotations

import logging
import math
from abc import ABC, abstractmethod
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from fovvideovdp_tpu import utils


# ---------------------------------------------------------------------------
# EOTFs
# ---------------------------------------------------------------------------

def srgb2lin(p):
    """sRGB display-encoded values (0..1) -> relative linear (0..1)."""
    return jnp.where(p > 0.04045, ((p + 0.055) / 1.055) ** 2.4, p / 12.92)


def pq2lin(V):
    """SMPTE ST 2084 (PQ) encoded values (0..1) -> absolute luminance (cd/m^2)."""
    Lmax = 10000.0
    n = 0.15930175781250000
    m = 78.843750000000000
    c1 = 0.83593750000000000
    c2 = 18.851562500000000
    c3 = 18.687500000000000
    im_t = jnp.power(jnp.maximum(V, 0.0), 1.0 / m)
    return Lmax * jnp.power(jnp.clip(im_t - c1, 0.0, None) / (c2 - c3 * im_t), 1.0 / n)


def lin2pq(L):
    """Absolute luminance (cd/m^2) -> PQ-encoded values (0..1)."""
    Lmax = 10000.0
    n = 0.15930175781250000
    m = 78.843750000000000
    c1 = 0.83593750000000000
    c2 = 18.851562500000000
    c3 = 18.687500000000000
    im = jnp.power(jnp.clip(L, 0.005, Lmax) / Lmax, n)
    return jnp.power((c2 * im + c1) / (1 + c3 * im), m)


# ---------------------------------------------------------------------------
# Photometry
# ---------------------------------------------------------------------------

class fvvdp_display_photometry(ABC):
    """Maps display-encoded pixel values to absolute linear luminance.

    Instances are hashable by configuration so they can be passed as static
    arguments to jitted conversion functions — two photometry objects with the
    same parameters share one compiled program.
    """

    @abstractmethod
    def forward(self, V):
        ...

    def _config_key(self):
        return (type(self),) + tuple(sorted(
            (k, v) for k, v in self.__dict__.items()
            if isinstance(v, (int, float, str, bool, type(None)))))

    def __hash__(self):
        return hash(self._config_key())

    def __eq__(self, other):
        return (isinstance(other, fvvdp_display_photometry)
                and self._config_key() == other._config_key())

    @abstractmethod
    def get_peak_luminance(self) -> float:
        ...

    @abstractmethod
    def get_black_level(self) -> float:
        ...

    def print(self):
        pass

    @classmethod
    def list_displays(cls):
        models_file = utils.config_files.find("display_models.json")
        models = utils.json2dict(models_file)
        for display_name in models:
            cls.load(display_name).print()

    @classmethod
    def load(cls, display_name: str) -> "fvvdp_display_photo_eotf":
        models_file = utils.config_files.find("display_models.json")
        models = utils.json2dict(models_file)
        if display_name not in models:
            raise RuntimeError(f'Unknown display model: "{display_name}"')
        model = models[display_name]

        Y_peak = model["max_luminance"]
        EOTF = model.get("EOTF", "sRGB")
        if "min_luminance" in model:
            contrast = Y_peak / model["min_luminance"]
        else:
            contrast = model.get("contrast", 500)
        E_ambient = model.get("E_ambient", 0)
        k_refl = model.get("k_refl", 0.005)
        gamma = model.get("gamma", 2.2)

        obj = fvvdp_display_photo_eotf(
            Y_peak, contrast=contrast, gamma=gamma, EOTF=EOTF,
            E_ambient=E_ambient, k_refl=k_refl, name=display_name)
        obj.full_name = model.get("name", display_name)
        obj.short_name = display_name
        return obj


class fvvdp_display_photo_eotf(fvvdp_display_photometry):
    """Multi-EOTF display model (sRGB / gamma / PQ / linear).

    Parity: pyfvvdp/fvvdp_display_model.py:114-188.
    """

    def __init__(self, Y_peak, contrast=1000, EOTF="sRGB", gamma=2.2,
                 E_ambient=0, k_refl=0.005, name=None):
        self.Y_peak = Y_peak
        self.contrast = contrast
        self.EOTF = EOTF
        self.gamma = gamma
        self.E_ambient = E_ambient
        self.k_refl = k_refl
        self.name = name

    def forward(self, V):
        if self.EOTF != "linear":
            V = jnp.clip(V, 0.0, 1.0)
        Y_black = self.get_black_level()
        if self.EOTF == "sRGB":
            return (self.Y_peak - Y_black) * srgb2lin(V) + Y_black
        if self.EOTF == "gamma":
            return (self.Y_peak - Y_black) * jnp.power(V, self.gamma) + Y_black
        if self.EOTF == "PQ":
            return jnp.clip(pq2lin(V), 0.005, self.Y_peak) + Y_black
        if self.EOTF == "linear":
            return jnp.clip(V, 0.005, self.Y_peak) + Y_black
        raise RuntimeError(f"Unknown EOTF '{self.EOTF}'")

    def get_peak_luminance(self):
        return self.Y_peak

    def get_black_level(self):
        # Reflected ambient light plus panel leakage.
        Y_refl = self.E_ambient / math.pi * self.k_refl
        return Y_refl + self.Y_peak / self.contrast

    def print(self):
        Y_black = self.get_black_level()
        logging.info(f"Photometric display model: {self.name}")
        logging.info(f"  Peak luminance: {self.Y_peak} cd/m^2")
        logging.info(f"  EOTF: {self.EOTF}")
        logging.info(f"  Contrast - theoretical: {round(self.contrast)}:1")
        logging.info(f"  Contrast - effective: {round(self.Y_peak / Y_black)}:1")
        logging.info(f"  Ambient light: {self.E_ambient} lux")
        logging.info(f"  Display reflectivity: {self.k_refl * 100}%")


class fvvdp_display_photo_absolute(fvvdp_display_photometry):
    """For content already scaled in absolute cd/m^2 (e.g. HDR images).

    Parity: pyfvvdp/fvvdp_display_model.py:305-341 (the surviving definition).
    """

    def __init__(self, L_max=10000, L_min=0.005):
        self.L_max = L_max
        self.L_min = L_min

    def forward(self, V):
        return jnp.clip(V, self.L_min, self.L_max)

    def get_peak_luminance(self):
        return self.L_max

    def get_black_level(self):
        return self.L_min

    def print(self):
        logging.info("Photometric display model:")
        logging.info("  Absolute photometric/colorimetric values")


class fvvdp_display_photo_gog(fvvdp_display_photometry):
    """Gain-gamma-offset model; deprecated but kept for API compatibility
    (pyfvvdp/fvvdp_display_model.py:231-302).  gamma==-1 selects sRGB."""

    def __init__(self, Y_peak, contrast=1000, gamma=2.2, E_ambient=0,
                 k_refl=0.005, name=None):
        self.Y_peak = Y_peak
        self.contrast = contrast
        self.gamma = gamma
        self.E_ambient = E_ambient
        self.k_refl = k_refl
        self.name = name

    def forward(self, V):
        V = jnp.clip(V, 0.0, 1.0)
        Y_black = self.get_black_level()
        if self.gamma == -1:
            return (self.Y_peak - Y_black) * srgb2lin(V) + Y_black
        return (self.Y_peak - Y_black) * jnp.power(V, self.gamma) + Y_black

    def get_peak_luminance(self):
        return self.Y_peak

    def get_black_level(self):
        Y_refl = self.E_ambient / math.pi * self.k_refl
        return Y_refl + self.Y_peak / self.contrast


# ---------------------------------------------------------------------------
# Geometry
# ---------------------------------------------------------------------------

class fvvdp_display_geometry:
    """Screen size/distance/FOV -> pixels per degree; off-axis magnification.

    Parity: pyfvvdp/fvvdp_display_model.py:383-537 plus the MATLAB-only
    fixed-ppd construction (matlab/fvvdp_display_geometry.m:101-106).
    """

    def __init__(self, resolution: Sequence[int], distance_m=None,
                 distance_display_heights=None, fov_horizontal=None,
                 fov_vertical=None, fov_diagonal=None,
                 diagonal_size_inches=None, pix_per_deg=None):
        self.resolution = tuple(resolution)
        ar = resolution[0] / resolution[1]  # width / height
        self.fixed_ppd = pix_per_deg

        if pix_per_deg is not None:
            self.ppd_centre = pix_per_deg
            self.distance_m = distance_m if distance_m is not None else 3.0
            # Nominal flat-screen size consistent with the fixed ppd.
            pix_deg = 1.0 / pix_per_deg
            width_deg = pix_deg * resolution[0]
            width_m = 2 * math.tan(math.radians(width_deg / 2)) * self.distance_m
            self.display_size_m = (width_m, width_m / ar)
            self.display_size_deg = (width_deg, width_deg / ar)
            return

        if diagonal_size_inches is not None:
            height_mm = math.sqrt((diagonal_size_inches * 25.4) ** 2 / (1 + ar ** 2))
            self.display_size_m = (ar * height_mm / 1000, height_mm / 1000)

        if distance_m is not None and distance_display_heights is not None:
            raise RuntimeError("You can pass only one of: distance_m, distance_display_heights.")

        if distance_m is not None:
            self.distance_m = distance_m
        elif distance_display_heights is not None:
            if not hasattr(self, "display_size_m"):
                raise RuntimeError(
                    "You need to specify display diagonal size 'diagonal_size_inches' "
                    "to specify viewing distance as 'distance_display_heights'")
            self.distance_m = distance_display_heights * self.display_size_m[1]
        elif fov_horizontal is not None or fov_vertical is not None or fov_diagonal is not None:
            self.distance_m = 3  # default viewing distance for VR headsets
        else:
            raise RuntimeError(
                "Viewing distance must be specified as 'distance_m' or 'distance_display_heights'.")

        n_fov = sum(x is not None for x in (fov_horizontal, fov_vertical, fov_diagonal))
        if n_fov > 1:
            raise RuntimeError(
                "You can pass only one of 'fov_horizontal', 'fov_vertical', 'fov_diagonal'.")

        if fov_horizontal is not None:
            width_m = 2 * math.tan(math.radians(fov_horizontal / 2)) * self.distance_m
            self.display_size_m = (width_m, width_m / ar)
        elif fov_vertical is not None:
            height_m = 2 * math.tan(math.radians(fov_vertical / 2)) * self.distance_m
            self.display_size_m = (height_m * ar, height_m)
        elif fov_diagonal is not None:
            # Work on distances, not degrees (Pythagoras does not hold on angles).
            distance_px = math.sqrt(resolution[0] ** 2 + resolution[1] ** 2) \
                / (2.0 * math.tan(math.radians(fov_diagonal * 0.5)))
            height_deg = math.degrees(math.atan(resolution[1] / 2 / distance_px)) * 2
            height_m = 2 * math.tan(math.radians(height_deg / 2)) * self.distance_m
            self.display_size_m = (height_m * ar, height_m)

        self.display_size_deg = (
            2 * math.degrees(math.atan(self.display_size_m[0] / (2 * self.distance_m))),
            2 * math.degrees(math.atan(self.display_size_m[1] / (2 * self.distance_m))))

        # ppd of the central pixel
        self.ppd_centre = 1 / (2 * math.degrees(
            math.atan(0.5 * self.display_size_m[0] / self.resolution[0] / self.distance_m)))

    def get_ppd(self, view_dir=None):
        """Pixels per degree; scalar at the centre or a map for view_dir
        [2, H, W] (degrees, centre-origin, y up)."""
        if view_dir is None:
            return self.ppd_centre
        if self.fixed_ppd is not None:
            return jnp.full(view_dir.shape[-2:], self.fixed_ppd, dtype=jnp.float32)
        view_angle = jnp.sqrt(jnp.sum(view_dir ** 2, axis=0))
        view_angle = jnp.minimum(view_angle, 89.9)  # avoid the tan singularity
        pix_deg = 1.0 / self.ppd_centre
        delta = pix_deg / 2
        tan_delta = math.tan(math.radians(delta))
        tan_a = jnp.tan(jnp.deg2rad(view_angle))
        return self.ppd_centre * (jnp.tan(jnp.deg2rad(view_angle + delta)) - tan_a) / tan_delta

    def pix2view_direction(self, resolution_pix, x_pix, y_pix):
        """Pixel coordinates -> view direction in degrees [2, ...].

        ``resolution_pix`` is (width, height) of the (sub-band) image the
        coordinates refer to; top-left pixel is (0, 0)."""
        res_w, res_h = float(resolution_pix[0]), float(resolution_pix[1])
        x_rel = x_pix - res_w / 2
        y_rel = y_pix - res_h / 2
        x_m = x_rel * self.display_size_m[0] / res_w
        y_m = -y_rel * self.display_size_m[1] / res_h
        return jnp.stack((
            jnp.rad2deg(jnp.arctan(x_m / self.distance_m)),
            jnp.rad2deg(jnp.arctan(y_m / self.distance_m))), axis=0)

    def get_resolution_magnification(self, view_dir):
        """Relative resolution magnification at the given view directions."""
        if self.fixed_ppd is not None:
            return jnp.ones(view_dir.shape[-2:], dtype=jnp.float32)
        return self.get_ppd(view_dir) / self.get_ppd()

    def print(self):
        logging.info("Geometric display model:")
        if self.fixed_ppd is not None:
            logging.info(f"  Fixed pixels-per-degree: {self.fixed_ppd}")
            return
        logging.info(f"  Resolution: {self.resolution[0]} x {self.resolution[1]} pixels")
        logging.info("  Display size: {:.1f} x {:.1f} cm".format(
            self.display_size_m[0] * 100, self.display_size_m[1] * 100))
        logging.info("  Display size: {:.2f} x {:.2f} deg".format(*self.display_size_deg))
        logging.info("  Viewing distance: {:.3f} m".format(self.distance_m))
        logging.info("  Pixels-per-degree (center): {:.2f}".format(self.get_ppd()))

    @classmethod
    def load(cls, display_name: str) -> "fvvdp_display_geometry":
        models_file = utils.config_files.find("display_models.json")
        models = utils.json2dict(models_file)
        if display_name not in models:
            raise RuntimeError(
                f"Error: Display model '{display_name}' not found in display_models.json")
        model = models[display_name]
        assert "resolution" in model
        inches_to_meters = 0.0254
        W, H = model["resolution"]

        fov_diagonal = model.get("fov_diagonal")
        if "viewing_distance_meters" in model:
            distance_m = model["viewing_distance_meters"]
        elif "viewing_distance_inches" in model:
            distance_m = model["viewing_distance_inches"] * inches_to_meters
        else:
            distance_m = None
        if "diagonal_size_meters" in model:
            diag_inch = model["diagonal_size_meters"] / inches_to_meters
        elif "diagonal_size_inches" in model:
            diag_inch = model["diagonal_size_inches"]
        else:
            diag_inch = None

        return cls((W, H), distance_m=distance_m, fov_diagonal=fov_diagonal,
                   diagonal_size_inches=diag_inch)
