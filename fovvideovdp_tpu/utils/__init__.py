"""Shared utilities: config-file resolution, JSON/.mat loading, PU transform,
Gaussian filtering.

Mirrors the roles of the reference's ``pyfvvdp/utils.py`` (config_files
resolver semantics: pyfvvdp/utils.py:129-154; PU: utils.py:157-202;
ImGaussFilt: utils.py:100-126) with a JAX-native implementation.
"""
from __future__ import annotations

import json
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np


def json2dict(path: str) -> dict:
    if not os.path.isfile(path):
        raise RuntimeError(f"Error: Cannot find file {path}")
    with open(path, "r") as f:
        return json.load(f)


class config_files:
    """Three-layer config resolution: explicit dir > $FVVDP_PATH > packaged data.

    Same precedence as the reference resolver (pyfvvdp/utils.py:137-154), so a
    user can point either implementation at the same external config directory.
    """

    fvvdp_config_dir: Optional[str] = None

    @classmethod
    def set_config_dir(cls, path: Optional[str]) -> None:
        cls.fvvdp_config_dir = path

    @classmethod
    def find(cls, fname: str) -> str:
        if cls.fvvdp_config_dir is not None:
            path = os.path.join(cls.fvvdp_config_dir, fname)
            if os.path.isfile(path):
                return path

        env_dir = os.getenv("FVVDP_PATH")
        if env_dir is not None:
            path = os.path.join(env_dir, fname)
            if os.path.isfile(path):
                return path

        path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "data", fname)
        if os.path.isfile(path):
            return path

        raise RuntimeError(f"The configuration file {fname} not found")


def load_mat_dict(filepath: str, data_label: str):
    """Load one variable from a MATLAB .mat file as a dict of numpy arrays.

    Kept for compatibility with user-supplied CSF caches in the reference's
    format (pyfvvdp/utils.py:52-63). Uses scipy when available.
    """
    if not os.path.isfile(filepath):
        return None
    import scipy.io as sio

    m = sio.loadmat(filepath)
    if data_label not in m:
        return None
    rec = m[data_label]
    if rec.dtype.names:  # MATLAB struct -> dict of arrays
        return {name: np.ascontiguousarray(rec[name][0, 0]) for name in rec.dtype.names}
    return np.asarray(rec)


def srgb2linear(srgb):
    srgb = jnp.clip(srgb, 0.0, 1.0)
    return jnp.where(srgb > 0.04045, ((srgb + 0.055) / 1.055) ** 2.4, srgb / 12.92)


def linear2srgb(lin):
    lin = jnp.clip(lin, 0.0, 1.0)
    return jnp.where(lin > 0.0031308, 1.055 * lin ** (1 / 2.4) - 0.055, 12.92 * lin)


class PU:
    """PU21 perceptually-uniform encoding of absolute luminance.

    Coefficients and formula follow the published PU21 transform
    (reference: pyfvvdp/utils.py:157-202).  Works on jnp and np arrays.
    """

    COEFFS = {
        "banding": [1.063020987, 0.4200327408, 0.1666005322, 0.2817030548,
                    1.029472678, 1.119265011, 502.1303377],
        "banding_glare": [234.0235618, 216.9339286, 0.0001091864237, 0.893206924,
                          0.06733984121, 1.444718567, 567.6315065],
        "peaks": [1.057454135, 0.6234292574, 0.3060331179, 0.3702234502,
                  1.116868695, 1.109926637, 391.3707005],
        "peaks_glare": [1.374063733, 0.3160810744, 0.1350497609, 0.510558148,
                        1.049265455, 1.404963498, 427.3579761],
    }

    def __init__(self, L_min=0.005, L_max=10000, type="banding_glare"):
        if type not in self.COEFFS:
            raise ValueError(f"Unknown type: {type}")
        self.L_min = L_min
        self.L_max = L_max
        self.p = self.COEFFS[type]
        p = self.p
        self.peak = p[6] * (((p[0] + p[1] * L_max ** p[3]) / (1 + p[2] * L_max ** p[3])) ** p[4] - p[5])

    def encode(self, Y):
        p = self.p
        Y = jnp.clip(Y, self.L_min, self.L_max)
        return p[6] * (((p[0] + p[1] * Y ** p[3]) / (1 + p[2] * Y ** p[3])) ** p[4] - p[5])

    def decode(self, V):
        p = self.p
        V_p = jnp.clip(V / p[6] + p[5], 0.0, None) ** (1 / p[4])
        return (jnp.clip(V_p - p[0], 0.0, None) / (p[1] - p[2] * V_p)) ** (1 / p[3])


def gaussian_kernel_2d(sigma: float) -> np.ndarray:
    """2-D Gaussian kernel with the reference's support rule
    (filter_size = 2*ceil(2*sigma)+1, pyfvvdp/utils.py:100-112)."""
    size = 2 * int(np.ceil(2.0 * sigma)) + 1
    half = (size - 1) // 2
    yy, xx = np.mgrid[-half:half + 1, -half:half + 1].astype(np.float64)
    K = np.exp(-(xx ** 2 + yy ** 2) / (2.0 * sigma * sigma))
    return (K / K.sum()).astype(np.float32)


class ImGaussFilt:
    """Gaussian blur matching pyfvvdp/utils.py:100-126 (reflect padding by
    default; pass pad_mode="edge" for MATLAB imgaussfilt's replicate
    padding)."""

    def __init__(self, sigma: float, pad_mode: str = "reflect"):
        self.K = jnp.asarray(gaussian_kernel_2d(sigma))
        self.half = (self.K.shape[0] - 1) // 2
        self.pad_mode = pad_mode

    def run(self, img):
        import jax.lax as lax

        squeeze = img.ndim == 2
        x = img[None, None] if squeeze else img
        h = self.half
        x = jnp.pad(x, ((0, 0), (0, 0), (h, h), (h, h)), mode=self.pad_mode)
        y = lax.conv_general_dilated(
            x.astype(jnp.float32), self.K[None, None],
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=lax.Precision.HIGHEST)
        return y[0, 0] if squeeze else y


def img2np(img):
    """uint8 image -> float32 in [0, 1] (parity: pyfvvdp/utils.py:36-37)."""
    return np.array(img, dtype="float32") / 255.0


def l2rgb(x):
    """Replicate a luminance plane into RGB (pyfvvdp/utils.py:42-43)."""
    return np.concatenate([x, x, x], -1)


def stack_horizontal(nparr):
    return np.concatenate(list(nparr), axis=-2)


def stack_vertical(nparr):
    return np.concatenate(list(nparr), axis=-3)


def platform_info() -> str:
    """One-line host + accelerator description for benchmark printouts.

    Covers the role of the reference's vendored ``third_party/cpuinfo``
    (pyfvvdp/fvvdp.py:29, used only by its commented-out benchmark printer,
    fvvdp.py:717-735) without the 860-line vendored module: model name and
    core count from /proc/cpuinfo, plus the JAX backend's device list.
    """
    cpu = "unknown CPU"
    try:
        model, cores = None, 0
        with open("/proc/cpuinfo", encoding="utf-8") as f:
            for line in f:
                if line.startswith("model name"):
                    cores += 1
                    if model is None:
                        model = line.split(":", 1)[1].strip()
        if model:
            cpu = f"{model} x{cores}"
    except OSError:
        pass
    try:
        import jax
        devs = jax.devices()
        kinds = {}
        for d in devs:
            kind = getattr(d, "device_kind", d.platform)
            kinds[kind] = kinds.get(kind, 0) + 1
        acc = ", ".join(f"{n}x {k}" for k, n in sorted(kinds.items()))
    except Exception as e:          # backend may be unreachable (wedged tunnel)
        acc = f"jax backend unavailable ({type(e).__name__})"
    return f"{cpu} | {acc}"
