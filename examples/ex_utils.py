"""Shared helpers for the example scripts: add noise / blur to test content."""
import numpy as np
from scipy.ndimage import gaussian_filter


def imnoise(clean, std, static=False, peak=None):
    """Add zero-mean Gaussian noise (std in normalized units)."""
    dtype = clean.dtype
    if peak is None:
        peak = 1 if dtype.kind == "f" else np.iinfo(dtype).max
    if static:
        h, w, c, N = clean.shape  # frame axis last
        noise = np.repeat(np.random.randn(h, w, c, 1) * std, N, axis=-1)
    else:
        noise = np.random.randn(*clean.shape) * std
    noisy = clean.astype(np.float32) / peak + noise
    return (noisy.clip(0, 1) * peak).astype(dtype)


def imgaussblur(clean, sigmas):
    """Blur image(s) with a 2-D Gaussian (per frame, per colour channel)."""
    squeeze = clean.ndim == 3
    if squeeze:
        clean = clean[..., np.newaxis]
    if np.isscalar(sigmas):
        sigmas = np.repeat(sigmas, clean.shape[-1])
    blur = np.zeros_like(clean)
    for ff, sigma in enumerate(sigmas):
        for cc in range(clean.shape[2]):
            blur[:, :, cc, ff] = gaussian_filter(
                clean[:, :, cc, ff].astype(np.float32), sigma,
                mode="nearest", truncate=2.0).astype(clean.dtype)
    return blur[..., 0] if squeeze else blur
