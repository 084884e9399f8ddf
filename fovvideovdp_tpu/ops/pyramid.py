"""Decimated Laplacian pyramid with fused Weber-contrast computation.

TPU-first reimplementation of the reference pyramid
(pyfvvdp/fvvdp_lpyr_dec.py:13-273).  Differences from the reference design:

* All shapes are resolved at trace time from a static ``PyramidPlan`` so the
  whole decomposition compiles to one XLA program with fixed-shape levels.
* The 5-tap separable Burt-Adelson filter (kernel ``[.25-a/2,.25,a,.25,
  .25-a/2]``, a=0.4; fvvdp_lpyr_dec.py:176) is expressed as strided slice
  arithmetic, which XLA fuses into tight VPU loops — no im2col, no conv op
  overhead for a 1-channel 5-tap filter.
* Levels carry arbitrary leading batch dims (frames x channels), so a whole
  block of frames decomposes in a single fused program.

Edge handling matches the reference *bit for bit*, including its quirk of
selecting the last-column correction branch by the ROW parity
(fvvdp_lpyr_dec.py:202 tests ``x.shape[-2]`` in the column pass); this matters
for JOD parity on levels whose height and width parities differ.
"""
from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Burt-Adelson generating kernel, a = 0.4.
KERNEL_A = 0.4
K5 = np.array([0.25 - KERNEL_A / 2.0, 0.25, KERNEL_A, 0.25, 0.25 - KERNEL_A / 2.0],
              dtype=np.float32)


def ceildiv(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# Separable reduce / expand primitives (operate on the last two axes)
# ---------------------------------------------------------------------------

def _reduce_rows(x: jnp.ndarray) -> jnp.ndarray:
    """5-tap filter + stride-2 along axis -2 with symmetric edge handling."""
    H = x.shape[-2]
    Ho = ceildiv(H, 2)
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(2, 2), (0, 0)], mode="symmetric")
    y = None
    for k in range(5):
        term = K5[k] * jnp.moveaxis(jnp.moveaxis(xp, -2, 0)[k:k + 2 * Ho - 1:2], 0, -2)
        y = term if y is None else y + term
    return y


def _reduce_cols(y_a: jnp.ndarray, in_rows: int) -> jnp.ndarray:
    """5-tap filter + stride-2 along axis -1, zero padding plus the
    reference's explicit boundary corrections (branch picked by the parity of
    the *input row count*, replicating fvvdp_lpyr_dec.py:198-205)."""
    W = y_a.shape[-1]
    Wo = ceildiv(W, 2)
    yp = jnp.pad(y_a, [(0, 0)] * (y_a.ndim - 2) + [(0, 0), (2, 2)])
    y = None
    for k in range(5):
        term = K5[k] * jnp.moveaxis(jnp.moveaxis(yp, -1, 0)[k:k + 2 * Wo - 1:2], 0, -1)
        y = term if y is None else y + term
    # First output column misses the two left out-of-range taps.
    y = y.at[..., 0].add(y_a[..., 0] * K5[1] + y_a[..., 1] * K5[0])
    if in_rows % 2 == 1:
        y = y.at[..., -1].add(y_a[..., -1] * K5[3] + y_a[..., -2] * K5[4])
    else:
        y = y.at[..., -1].add(y_a[..., -1] * K5[4])
    return y


def _gausspyr_reduce_jnp(x: jnp.ndarray) -> jnp.ndarray:
    y_a = _reduce_rows(x)
    return _reduce_cols(y_a, x.shape[-2])


@jax.custom_vjp
def _gausspyr_reduce_pallas_vjp(x):
    from fovvideovdp_tpu.ops.pallas.reduce import gausspyr_reduce_pallas
    return gausspyr_reduce_pallas(x)


def _reduce_fwd(x):
    return _gausspyr_reduce_pallas_vjp(x), jax.eval_shape(lambda: x)


def _reduce_bwd(in_aval, g):
    # the reduction is linear; its VJP is the transpose of the jnp reference
    transpose = jax.linear_transpose(_gausspyr_reduce_jnp, in_aval)
    return (transpose(g)[0],)


_gausspyr_reduce_pallas_vjp.defvjp(_reduce_fwd, _reduce_bwd)


def gausspyr_reduce(x: jnp.ndarray) -> jnp.ndarray:
    """One level of Gaussian-pyramid reduction: (..., H, W) -> (..., ceil(H/2),
    ceil(W/2)).  Equivalent to fvvdp_lpyr_dec.py:183-207.

    Dispatches to the fused Pallas TPU kernel for supported shapes (identical
    numerics; jnp fallback elsewhere and as the gradient rule)."""
    from fovvideovdp_tpu.ops import pallas as pallas_cfg
    H, W = x.shape[-2], x.shape[-1]
    if x.dtype == jnp.float32 and pallas_cfg.use_pallas():
        from fovvideovdp_tpu.ops.pallas import reduce as pallas_reduce
        if pallas_reduce.supports(H, W):
            return _gausspyr_reduce_pallas_vjp(x)
    return _gausspyr_reduce_jnp(x)


def _interleave_pad(x: jnp.ndarray, out_size: int, axis: int) -> jnp.ndarray:
    """Zero-interleave x along `axis` into a buffer of length out_size+4 with
    the reference's boundary fill (fvvdp_lpyr_dec.py:126-142)."""
    x = jnp.moveaxis(x, axis, -1)
    shape = x.shape[:-1] + (out_size + 4,)
    z = jnp.zeros(shape, dtype=x.dtype)
    z = z.at[..., 2:-2:2].set(x)
    z = z.at[..., 0].set(x[..., 0])
    odd = out_size % 2
    z = z.at[..., -2 + odd].set(x[..., -1])
    return jnp.moveaxis(z, -1, axis)


def _conv5_valid(z: jnp.ndarray, axis: int, gain: float) -> jnp.ndarray:
    """Valid 5-tap convolution along `axis` with kernel gain*K5."""
    z = jnp.moveaxis(z, axis, 0)
    n_out = z.shape[0] - 4
    y = None
    for k in range(5):
        term = (gain * K5[k]) * z[k:k + n_out]
        y = term if y is None else y + term
    return jnp.moveaxis(y, 0, axis)


def gausspyr_expand(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """One level of Gaussian-pyramid expansion to (..., size[0], size[1]).
    Equivalent to fvvdp_lpyr_dec.py:219-235."""
    y = _interleave_pad(x, size[0], axis=-2)
    y = _conv5_valid(y, axis=-2, gain=2.0)
    y = _interleave_pad(y, size[1], axis=-1)
    y = _conv5_valid(y, axis=-1, gain=2.0)
    return y


def _expand_contrast_jnp(g_fine, g_coarse, size, bkg_channel):
    glayer_ex = gausspyr_expand(g_coarse, size)
    L_bkg = jnp.clip(glayer_ex[..., bkg_channel:bkg_channel + 1, :, :], 0.1, None)
    contrast = jnp.clip((g_fine - glayer_ex) / L_bkg, None, 1000.0)
    return contrast, L_bkg


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _expand_contrast_pallas_vjp(g_fine, g_coarse, size, bkg_channel):
    from fovvideovdp_tpu.ops.pallas.expand import expand_contrast_pallas
    return expand_contrast_pallas(g_fine, g_coarse, bkg_channel)


def _ec_fwd(g_fine, g_coarse, size, bkg_channel):
    out = _expand_contrast_pallas_vjp(g_fine, g_coarse, size, bkg_channel)
    return out, (g_fine, g_coarse)


def _ec_bwd(size, bkg_channel, res, g):
    g_fine, g_coarse = res
    _, vjp = jax.vjp(lambda a, b: _expand_contrast_jnp(a, b, size, bkg_channel),
                     g_fine, g_coarse)
    return vjp(g)


_expand_contrast_pallas_vjp.defvjp(_ec_fwd, _ec_bwd)


def _expand_contrast_level(g_fine, g_coarse, size, bkg_channel):
    """One fused contrast-pyramid level with Pallas dispatch."""
    from fovvideovdp_tpu.ops import pallas as pallas_cfg
    H, W = size
    if (g_fine.dtype == jnp.float32 and g_fine.ndim == 4
            and pallas_cfg.use_pallas()):
        from fovvideovdp_tpu.ops.pallas import expand as pallas_expand
        if pallas_expand.supports(H, W):
            return _expand_contrast_pallas_vjp(g_fine, g_coarse, size, bkg_channel)
    return _expand_contrast_jnp(g_fine, g_coarse, size, bkg_channel)


# ---------------------------------------------------------------------------
# Pyramid plan + decompositions
# ---------------------------------------------------------------------------

class PyramidPlan:
    """Static description of the pyramid for a given (W, H, ppd).

    ``height`` counts the Laplacian (scored) bands; the stored pyramid has
    ``height + 1`` bands (the last one is the Gaussian base).  Band peak
    frequencies follow fvvdp_lpyr_dec.py:24,39: ``[1, 0.3228*2^-k]*ppd/2``
    cut off below 0.5 cpd.
    """

    MIN_FREQ = 0.5

    def __init__(self, W: int, H: int, ppd: float):
        self.W = W
        self.H = H
        self.ppd = ppd

        max_levels = int(np.floor(np.log2(min(H, W)))) - 1
        bands = np.concatenate([[1.0], np.power(2.0, -np.arange(0.0, 14.0)) * 0.3228]) * ppd / 2.0
        invalid = np.nonzero(bands <= self.MIN_FREQ)[0]
        max_band = invalid[0] if invalid.size > 0 else max_levels
        self.height = int(np.clip(max_band + 1, 0, max_levels))
        self.band_freqs = np.array(
            [1.0] + [0.3228 * 2.0 ** (-f) for f in range(self.height)]) * ppd / 2.0

        self.level_shapes: List[Tuple[int, int]] = []
        cH, cW = H, W
        for _ in range(self.height + 1):
            self.level_shapes.append((cH, cW))
            cH, cW = ceildiv(cH, 2), ceildiv(cW, 2)

    # -- reference-compatible accessors ------------------------------------
    def get_freqs(self) -> np.ndarray:
        return self.band_freqs

    def get_band_count(self) -> int:
        return self.height + 1

    @staticmethod
    def band_gain(band: int, n_bands: int) -> float:
        """Interior Laplacian bands carry a 2x gain (fvvdp_lpyr_dec.py:57-71)."""
        return 1.0 if band == 0 or band == n_bands - 1 else 2.0

    def get_band(self, bands: Sequence[jnp.ndarray], band: int) -> jnp.ndarray:
        return bands[band] * self.band_gain(band, len(bands))

    def set_band(self, bands: List[jnp.ndarray], band: int, data: jnp.ndarray) -> None:
        bands[band] = data / self.band_gain(band, len(bands))

    @staticmethod
    def get_gband(gbands: Sequence[jnp.ndarray], band: int) -> jnp.ndarray:
        """Gaussian-level accessor (parity: fvvdp_lpyr_dec.py:73-74)."""
        return gbands[band]

    def get_gband_count(self) -> int:
        return self.height + 1

    # -- decompositions ------------------------------------------------------
    def gaussian_pyramid(self, image: jnp.ndarray) -> List[jnp.ndarray]:
        levels = [image]
        for _ in range(self.height):
            levels.append(gausspyr_reduce(levels[-1]))
        return levels

    def decompose(self, image: jnp.ndarray) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        """Plain Laplacian decomposition (fvvdp_lpyr_dec.py:103-124).

        Returns (laplacian bands + base, gaussian levels)."""
        gpyr = self.gaussian_pyramid(image)
        lpyr = []
        for i in range(len(gpyr) - 1):
            expanded = gausspyr_expand(gpyr[i + 1], self.level_shapes[i])
            lpyr.append(gpyr[i] - expanded)
        lpyr.append(gpyr[-1])
        return lpyr, gpyr

    def decompose_contrast(self, image: jnp.ndarray, bkg_channel: int = 1,
                           ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        """Fused contrast-during-decompose (fvvdp_lpyr_dec.py:246-273).

        ``image`` is (..., C, H, W); the background luminance L_bkg is the
        expanded next-level Gaussian of channel ``bkg_channel`` (reference
        sustained), clamped to >= 0.1 cd/m^2; each Laplacian band is converted
        to Weber contrast clamped to <= 1000.

        Per level, dispatches to the fused Pallas expand+contrast kernel on
        TPU (ops/pallas/expand.py) with the jnp composition as fallback and
        gradient rule.

        Returns (contrast bands + base, L_bkg per level)."""
        gpyr = self.gaussian_pyramid(image)
        lpyr: List[jnp.ndarray] = []
        L_bkg_pyr: List[jnp.ndarray] = []
        for i in range(len(gpyr) - 1):
            contrast, L_bkg = _expand_contrast_level(
                gpyr[i], gpyr[i + 1], self.level_shapes[i], bkg_channel)
            lpyr.append(contrast)
            L_bkg_pyr.append(L_bkg)
        lpyr.append(gpyr[-1])
        return lpyr, L_bkg_pyr

    def reconstruct(self, bands: Sequence[jnp.ndarray]) -> jnp.ndarray:
        """Sum of expanded bands (fvvdp_lpyr_dec.py:94-101)."""
        img = bands[-1]
        for i in reversed(range(len(bands) - 1)):
            img = gausspyr_expand(img, (bands[i].shape[-2], bands[i].shape[-1]))
            img = img + bands[i]
        return img
