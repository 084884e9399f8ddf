"""Shared helpers for the example scripts: synthesize distorted test content.

The distortion protocols (noise variance, blur sigma) follow the published
example configuration (reference README.md:137-138) so the printed JODs are
comparable; the implementations are vectorized numpy.

Importing this module also makes the examples runnable straight from a
source checkout (``cd examples && python ex_simple_image.py``): if the
package is not installed, the repository root is added to sys.path.
"""
import importlib.util
import os
import sys

if importlib.util.find_spec("fovvideovdp_tpu") is None:
    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from scipy.ndimage import gaussian_filter


def imnoise(clean, std, static=False, peak=None):
    """Zero-mean Gaussian noise in normalized units.

    ``static=True`` draws one (H, W, C) noise field and reuses it for every
    frame (frame axis last); otherwise the noise is i.i.d. per frame.
    """
    if peak is None:
        peak = 1.0 if clean.dtype.kind == "f" else float(np.iinfo(clean.dtype).max)
    noise_shape = clean.shape[:-1] + (1,) if static else clean.shape
    noise = np.random.standard_normal(noise_shape).astype(np.float32) * std
    noisy = clean.astype(np.float32) / peak + noise  # broadcasts static noise
    return (np.clip(noisy, 0.0, 1.0) * peak).astype(clean.dtype)


def imgaussblur(clean, sigmas):
    """2-D Gaussian blur of (H, W, C) or (H, W, C, F) content.

    ``sigmas`` is a scalar (same blur everywhere) or a per-frame sequence;
    only the spatial axes are filtered.
    """
    x = clean[..., np.newaxis] if clean.ndim == 3 else clean
    xf = x.astype(np.float32)
    if np.isscalar(sigmas):
        out = gaussian_filter(xf, sigma=(sigmas, sigmas, 0, 0),
                              mode="nearest", truncate=2.0)
    else:
        out = np.stack([gaussian_filter(xf[..., ff], sigma=(s, s, 0),
                                        mode="nearest", truncate=2.0)
                        for ff, s in enumerate(sigmas)], axis=-1)
    out = out.astype(clean.dtype)
    return out[..., 0] if clean.ndim == 3 else out
