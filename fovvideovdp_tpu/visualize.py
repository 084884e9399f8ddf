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
_BINS_HI = 32          # _N_BINS = _BINS_HI * _BINS_LO
_BINS_LO = 32
_TONEMAP_CHUNK = 1 << 19


def log_luminance(y):
    """log of luminance clamped to its smallest positive value
    (visualize_diff_map.py:20-23)."""
    pos_min = jnp.min(jnp.where(y > 0.0, y, jnp.inf))
    pos_min = jnp.where(jnp.isfinite(pos_min), pos_min, 1e-6)
    return jnp.log(jnp.clip(y, pos_min, None))


def _two_level_onehot(idx, dtype):
    """Split a [0, _N_BINS) index into two one-hot factors so 1024-entry
    table operations become 32-wide MXU contractions instead of per-pixel
    gathers/scatters (~1000x slower on TPU)."""
    hi = idx // _BINS_LO
    lo = idx - hi * _BINS_LO
    return (jax.nn.one_hot(hi, _BINS_HI, dtype=dtype),
            jax.nn.one_hot(lo, _BINS_LO, dtype=dtype))


def vis_tonemap(b, dr: float):
    """Histogram-equalisation tone mapping into a dr-wide value range
    (visualize_diff_map.py:26-48).

    Gather/scatter-free: the 1024-bin histogram is accumulated as chunked
    one-hot matmuls (exact integer counts in fp32), and the equalisation
    curve lookup is a factored one-hot contraction with the 32x32-reshaped
    cumsum table.  The scatter/gather formulation costs ~1 s per 4K frame on
    TPU; this form runs in milliseconds.
    """
    t = 3.0
    b_min = jnp.min(b)
    b_max = jnp.max(b)

    shape = b.shape
    bf = b.reshape(-1)
    P = bf.shape[0]
    chunk = min(_TONEMAP_CHUNK, P)
    n_chunks = -(-P // chunk)
    pad = n_chunks * chunk - P
    bp = jnp.concatenate([bf, jnp.full((pad,), b_min, bf.dtype)]) if pad else bf
    chunks = bp.reshape(n_chunks, chunk)

    def no_tmo(_):
        return (b - b_min) / (b_max - b_min + 1e-3) * dr + (1 - dr) / 2

    def histeq(_):
        span = b_max - b_min

        def hist_step(acc, bc):
            bins = jnp.clip(((bc - b_min) / span * _N_BINS).astype(jnp.int32),
                            0, _N_BINS - 1)
            oh_hi, oh_lo = _two_level_onehot(bins, bc.dtype)
            return acc + jax.lax.dot(oh_hi.T, oh_lo,
                                     precision=jax.lax.Precision.HIGHEST), None

        hist2, _ = jax.lax.scan(hist_step,
                                jnp.zeros((_BINS_HI, _BINS_LO), bf.dtype),
                                chunks)
        b_p = hist2.reshape(-1)
        if pad:  # padding samples land in bin 0 of the b_min chunk tail
            b_p = b_p.at[0].add(-float(pad))
        b_p = b_p / jnp.sum(b_p)
        dy = jnp.power(b_p, 1.0 / t)
        dy = dy / jnp.sum(dy)
        v = jnp.cumsum(dy) * dr + (1.0 - dr) / 2.0
        V2 = v.reshape(_BINS_HI, _BINS_LO)

        # linear interpolation on the uniform b_scale grid
        # (linspace(0,1,N)*span + b_min): the cell is index arithmetic
        dx = span / (_N_BINS - 1)

        def fetch(i, dtype):
            oh_hi, oh_lo = _two_level_onehot(i, dtype)
            A = jax.lax.dot(oh_hi, V2.astype(dtype),
                            precision=jax.lax.Precision.HIGHEST)
            return jnp.sum(A * oh_lo, axis=-1)

        def look_step(bc):
            u = jnp.clip((bc - b_min) / dx, 0.0, float(_N_BINS - 1))
            i0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, _N_BINS - 2)
            f = u - i0.astype(bc.dtype)
            return fetch(i0, bc.dtype) * (1.0 - f) + fetch(i0 + 1, bc.dtype) * f

        return jax.lax.map(look_step, chunks).reshape(-1)[:P].reshape(shape)

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

    # The colormap knots are static (<= 5 entries), so the 1-D interpolation
    # unrolls into a chain of elementwise selects — no per-pixel gather.
    channels = [_interp1_static_knots(color_map_in, cm_ch[:, c], diff_map[0])
                for c in range(3)]
    cmap = jnp.stack(channels, axis=0)

    return jnp.clip(cmap * tmo_img, 0.0, 1.0)


def _interp1_static_knots(x_np: np.ndarray, v_np: np.ndarray, q):
    """Piecewise-linear interpolation with trace-time-constant knots,
    evaluated as unrolled elementwise selects (queries must lie inside
    [x[0], x[-1]]; the callers clip)."""
    out = jnp.full_like(q, float(v_np[0]))
    for i in range(len(x_np) - 1):
        x0, x1 = float(x_np[i]), float(x_np[i + 1])
        v0, v1 = float(v_np[i]), float(v_np[i + 1])
        f = (q - x0) / (x1 - x0 + 1e-6)
        out = jnp.where((q > x0) & (q <= x1), v0 + f * (v1 - v0), out)
    return out


def visualize_diff_map_frames(dmap, context, colormap_type="supra-threshold"):
    """Multi-frame variant: dmap/context (F, 1, H, W) -> (F, 3, H, W).

    Frames go through ``lax.map`` (sequential scan), not vmap: the per-frame
    tone-mapping already fills the chip, and batching would multiply its
    chunked one-hot intermediates by F."""
    if dmap.shape[0] == 1:
        return visualize_diff_map(dmap[0], context[0], colormap_type)[None]
    return jax.lax.map(
        lambda dc: visualize_diff_map(dc[0], dc[1], colormap_type),
        (dmap, context))


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
