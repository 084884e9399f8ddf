"""Vectorised LUT interpolation (1-D linear and 3-D trilinear).

Semantics mirror the reference interpolators (pyfvvdp/interp.py:11-69):
bucketised cell search with a small epsilon in the fraction denominator,
clamped end-cells, and zeroed fractions outside the grid.  Implemented as
pure-jnp gathers so the ops fuse into surrounding elementwise work under XLA
and differentiate cleanly.
"""
from __future__ import annotations

import jax.numpy as jnp


def _interpolants(x_q, x):
    """Return (i_lo, i_hi, frac) for query points x_q in grid x (ascending)."""
    n = x.shape[0]
    # First grid index with x[i] >= x_q  (matches torch.bucketize right=False).
    i_hi = jnp.searchsorted(x, x_q, side="left")
    i_hi = jnp.minimum(i_hi, n - 1)
    i_lo = jnp.clip(i_hi - 1, 0, n - 1)

    frac = (x_q - x[i_lo]) / (x[i_hi] - x[i_lo] + 1e-6)
    frac = jnp.where(i_hi == i_lo, 0.0, frac)
    frac = jnp.where(frac < 0.0, 0.0, frac)
    return i_lo, i_hi, frac


def interp1(x, v, x_q):
    """Linear interpolation of v(x) at query points x_q (any shape)."""
    shp = x_q.shape
    x_q = x_q.reshape(-1)
    i_lo, i_hi, f = _interpolants(x_q, x)
    out = v[i_lo] * (1.0 - f) + v[i_hi] * f
    return out.reshape(shp)


def interp3(x, y, z, v, x_q, y_q, z_q):
    """Trilinear interpolation on a 3-D grid.

    ``v`` is indexed ``v[y, x, z]`` — the same (surprising) axis order as the
    reference (pyfvvdp/interp.py:53-57, itself mirroring MATLAB interp3).
    """
    shp = x_q.shape
    x_q, y_q, z_q = x_q.reshape(-1), y_q.reshape(-1), z_q.reshape(-1)

    i_lo, i_hi, fi = _interpolants(x_q, x)
    j_lo, j_hi, fj = _interpolants(y_q, y)
    k_lo, k_hi, fk = _interpolants(z_q, z)

    def g(j, i, k):
        return v[j, i, k]

    c_lo = ((g(j_lo, i_lo, k_lo) * (1 - fi) + g(j_lo, i_hi, k_lo) * fi) * (1 - fj)
            + (g(j_hi, i_lo, k_lo) * (1 - fi) + g(j_hi, i_hi, k_lo) * fi) * fj)
    c_hi = ((g(j_lo, i_lo, k_hi) * (1 - fi) + g(j_lo, i_hi, k_hi) * fi) * (1 - fj)
            + (g(j_hi, i_lo, k_hi) * (1 - fi) + g(j_hi, i_hi, k_hi) * fi) * fj)
    out = c_lo * (1 - fk) + c_hi * fk
    return out.reshape(shp)
