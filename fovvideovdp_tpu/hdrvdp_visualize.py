"""Full visualization toolkit for metric prediction maps.

Port of the MATLAB hdrvdp_visualize superset (matlab/utils/
hdrvdp_visualize.m) — the reference's Python package only carries a subset of
these modes (pyfvvdp/visualize_diff_map.py:50-55).  Provides:

* 'pmap'  — probability-of-detection map visualization,
* 'diff'  — contrast-normalized difference weighted by probability,
* 'civdm' — contrast-invariant (dynamic-range independent) distortion map,
* colormaps: trichromatic / dichromatic / monochromatic,
* targets:  'screen' (colour) and 'print' (grayscale-printable: luma carries
  the error signal; the context image is reduced to its low-contrast
  high-frequency content).

All functions are jnp and jit-able; inputs are (H, W) or (H, W, 3) arrays.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fovvideovdp_tpu.ops.interp import interp1
from fovvideovdp_tpu.visualize import vis_tonemap

_COLORMAPS = {
    "trichromatic": (
        np.array([[0.2, 0.2, 1.0], [0.2, 1.0, 1.0], [0.2, 1.0, 0.2],
                  [1.0, 1.0, 0.2], [1.0, 0.2, 0.2]], np.float32),
        np.array([0.0, 0.25, 0.5, 0.75, 1.0], np.float32)),
    "dichromatic": (
        np.array([[0.2, 1.0, 1.0], [1.0, 1.0, 1.0], [1.0, 1.0, 0.2]],
                 np.float32),
        np.array([0.0, 0.5, 1.0], np.float32)),
    "monochromatic": (
        np.array([[1.0, 1.0, 1.0], [1.0, 1.0, 1.0]], np.float32),
        np.array([0.0, 1.0], np.float32)),
}

_LUM_W = np.array([0.2126, 0.7152, 0.0722], np.float32)


def _luminance(img):
    if img.ndim == 3 and img.shape[-1] == 3:
        return (img[..., 0] * 0.212656 + img[..., 1] * 0.715158
                + img[..., 2] * 0.072186)
    return img if img.ndim == 2 else img[..., 0]


def _log_luminance(img):
    Y = _luminance(img)
    pos_min = jnp.min(jnp.where(Y > 0, Y, jnp.inf))
    pos_min = jnp.where(jnp.isfinite(pos_min), pos_min, 1e-6)
    return jnp.log(jnp.clip(Y, pos_min, None))


def _blur_gaussian(X, sigma):
    ksize2 = int(round(sigma * 3))
    g = np.exp(-np.arange(-ksize2, ksize2 + 1) ** 2 / (2.0 * sigma ** 2))
    g = (g / g.sum()).astype(np.float32)
    pad = ksize2
    Xp = jnp.pad(X, ((pad, pad), (pad, pad)))
    # separable same-size convolution with zero padding (matches conv2 'same')
    rows = jax.vmap(lambda r: jnp.convolve(r, g, mode="valid"))(Xp)
    cols = jax.vmap(lambda c: jnp.convolve(c, g, mode="valid"),
                    in_axes=1, out_axes=1)(rows)
    return cols


def _context_tmo(context_image, target, shape):
    if context_image is None:
        return jnp.full(shape, 0.5, dtype=jnp.float32)
    if target == "print":
        l = _log_luminance(context_image)
        hp_img = l - _blur_gaussian(l, 2.0) + jnp.mean(l)
        return vis_tonemap(hp_img, 0.1) + 0.5
    if target == "screen":
        return vis_tonemap(_log_luminance(context_image), 0.6)
    raise RuntimeError(f"Unknown target: {target}")


def visualize_pmap(P, context_image=None, target="screen",
                   colormap="trichromatic"):
    """Probability-of-detection map -> sRGB visualization (H, W, 3)."""
    if colormap not in _COLORMAPS:
        raise RuntimeError(f"Unknown colormap: {colormap}")
    color_map, color_map_in = _COLORMAPS[colormap]

    P = jnp.clip(P, 0.0, 1.0)
    tmo_img = _context_tmo(context_image, target, P.shape)

    if target == "screen":
        cm_l = color_map @ _LUM_W
    elif colormap == "monochromatic":
        cm_l = (color_map @ _LUM_W) / np.maximum(color_map_in, 1e-4)
    else:
        # luminance ramp starts at 0.3 so colours stay visible in print
        cm_l = (color_map @ _LUM_W) / (color_map_in * 0.8 + 0.2)
    cm_ch = color_map / cm_l[:, None]

    cm_in = jnp.asarray(color_map_in)
    chans = [interp1(cm_in, jnp.asarray(cm_ch[:, c]), P) for c in range(3)]
    vis = jnp.stack(chans, axis=-1) * tmo_img[..., None]
    return jnp.clip(vis, 0.0, 1.0)


def norm_diff_img(test, reference, sigma: float = 5.0):
    """Contrast-normalized difference image (hdrvdp_visualize.m:300-313)."""
    D = _luminance(test) - _luminance(reference)
    ks = int(round(sigma * 4))
    half = (ks - 1) / 2.0
    xx, yy = np.meshgrid(np.arange(ks) - half, np.arange(ks) - half)
    w = np.exp(-(xx ** 2 + yy ** 2) / (2 * sigma ** 2))
    w = (w / w.sum()).astype(np.float32)

    def filt(X):
        pad_t = ks // 2
        pad_b = ks - 1 - pad_t
        Xp = jnp.pad(X, ((pad_b, pad_t), (pad_b, pad_t)))
        return jax.lax.conv_general_dilated(
            Xp[None, None], jnp.asarray(w)[None, None], (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=jax.lax.Precision.HIGHEST)[0, 0]

    mu = filt(D)
    sigma_sq = jnp.clip(filt(D * D) - mu ** 2, 0.0, None)
    return jnp.minimum(D / (jnp.sqrt(sigma_sq) + 1.0), 1.0)


def visualize_diff(P, test, reference, context_image=None, target="screen",
                   colormap="trichromatic"):
    """Contrast-normalized difference weighted by detection probability."""
    Pd = norm_diff_img(test, reference) * jnp.clip(P, 0.0, 1.0)
    return visualize_pmap(Pd, context_image=context_image, target=target,
                          colormap=colormap)


def visualize_civdm(loss, ampl, rev, context_image=None):
    """Contrast-invariant distortion map: red = contrast reversal,
    green = contrast loss, blue = contrast amplification
    (hdrvdp_visualize.m:363-381)."""
    cmap = jnp.stack([rev, loss, ampl], axis=-1)
    max_v = jnp.max(cmap, axis=-1, keepdims=True)
    cmap = jnp.where(cmap < max_v, 0.0, cmap)
    if context_image is not None:
        tmo = vis_tonemap(_log_luminance(context_image), 0.6)
        alpha = 0.5
        cmap = (1 - alpha) * cmap + alpha * (tmo ** (1 / 2.2))[..., None]
    return jnp.clip(cmap, 0.0, 1.0)
