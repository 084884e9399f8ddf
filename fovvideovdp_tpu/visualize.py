"""Difference-map visualization: histogram-equalised context tone-mapping and
threshold / supra-threshold / monochromatic colour maps.

Parity with pyfvvdp/visualize_diff_map.py:26-107 (itself a port of
matlab/utils/hdrvdp_visualize.m), implemented as jit-able jnp so heatmap
frames are rendered on device before the single fp16 transfer to host.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_COLORMAPS = {
    "threshold": (
        np.array([[0.2, 0.2, 1.0],
                  [0.2, 1.0, 1.0],
                  [0.2, 1.0, 0.2],
                  [1.0, 1.0, 0.2],
                  [1.0, 0.2, 0.2]], dtype=np.float32),
        np.array([0.00, 0.25, 0.50, 0.75, 1.00], dtype=np.float32)),
    "supra-threshold": (
        np.array([[0.2, 1.0, 1.0],
                  [1.0, 1.0, 1.0],
                  [1.0, 1.0, 0.2]], dtype=np.float32),
        np.array([0.0, 0.5, 1.0], dtype=np.float32)),
    "monochromatic": (
        np.array([[1.0, 1.0, 1.0],
                  [1.0, 1.0, 1.0]], dtype=np.float32),
        np.array([0.0, 1.0], dtype=np.float32)),
}

_N_BINS = 1024


def _interp1(x, v, x_q):
    from fovvideovdp_tpu.ops.interp import interp1
    return interp1(x, v, x_q)


def log_luminance(y):
    """log of luminance clamped to its smallest positive value
    (visualize_diff_map.py:20-23)."""
    pos_min = jnp.min(jnp.where(y > 0.0, y, jnp.inf))
    pos_min = jnp.where(jnp.isfinite(pos_min), pos_min, 1e-6)
    return jnp.log(jnp.clip(y, pos_min, None))


def vis_tonemap(b, dr: float):
    """Histogram-equalisation tone mapping into a dr-wide value range
    (visualize_diff_map.py:26-48)."""
    t = 3.0
    b_min = jnp.min(b)
    b_max = jnp.max(b)

    def no_tmo(_):
        return (b - b_min) / (b_max - b_min + 1e-3) * dr + (1 - dr) / 2

    def histeq(_):
        span = b_max - b_min
        bins = jnp.clip(((b - b_min) / span * _N_BINS).astype(jnp.int32), 0, _N_BINS - 1)
        b_p = jnp.bincount(bins.reshape(-1), length=_N_BINS).astype(b.dtype)
        b_p = b_p / jnp.sum(b_p)
        dy = jnp.power(b_p, 1.0 / t)
        dy = dy / jnp.sum(dy)
        v = jnp.cumsum(dy) * dr + (1.0 - dr) / 2.0
        b_scale = jnp.linspace(0.0, 1.0, _N_BINS) * span + b_min
        return _interp1(b_scale, v, b)

    return jax.lax.cond(b_max - b_min < dr, no_tmo, histeq, None)


def visualize_diff_map(diff_map, context_image=None, colormap_type="supra-threshold"):
    """Colour-mapped visual difference overlay for ONE frame.

    diff_map: (1, H, W) in 0..1; context_image: (1, H, W) luminance or None.
    Returns (3, H, W) sRGB-ish overlay (visualize_diff_map.py:56-107).
    """
    if colormap_type not in _COLORMAPS:
        raise RuntimeError(f"Unknown colormap: {colormap_type}")
    color_map, color_map_in = _COLORMAPS[colormap_type]

    diff_map = jnp.clip(diff_map, 0.0, 1.0)
    if context_image is None:
        tmo_img = jnp.ones_like(diff_map) * 0.5
    else:
        tmo_img = vis_tonemap(log_luminance(context_image), 0.6)

    cm_l = (color_map[:, 0] * 0.212656 + color_map[:, 1] * 0.715158
            + color_map[:, 2] * 0.072186)
    cm_ch = color_map / (cm_l[:, None] + 0.0001)

    cm_in = jnp.asarray(color_map_in)
    channels = [_interp1(cm_in, jnp.asarray(cm_ch[:, c]), diff_map[0]) for c in range(3)]
    cmap = jnp.stack(channels, axis=0)

    return jnp.clip(cmap * tmo_img, 0.0, 1.0)


def visualize_diff_map_frames(dmap, context, colormap_type="supra-threshold"):
    """vmapped multi-frame variant: dmap/context (F, 1, H, W) -> (F, 3, H, W)."""
    return jax.vmap(lambda d, c: visualize_diff_map(d, c, colormap_type))(dmap, context)


def add_fixation_cross(frame, fixation_point, size: int = 21,
                       value: float = 1.0):
    """Overlay a gaze cross for debugging foveated runs
    (port of matlab/utils/fvvdp_add_fixation_cross.m).

    frame: (..., H, W); fixation_point: (x, y) in pixels."""
    H, W = frame.shape[-2], frame.shape[-1]
    fx = jnp.asarray(fixation_point[0], jnp.int32)
    fy = jnp.asarray(fixation_point[1], jnp.int32)
    half = size // 2
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    on_v = (jnp.abs(xx - fx) <= 1) & (jnp.abs(yy - fy) <= half)
    on_h = (jnp.abs(yy - fy) <= 1) & (jnp.abs(xx - fx) <= half)
    return jnp.where(on_v | on_h, value, frame)
