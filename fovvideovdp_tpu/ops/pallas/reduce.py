"""Fused Gaussian-pyramid reduction as a Pallas TPU kernel.

Strategy: the input is row-padded once in XLA (symmetric padding — exactly
the reference's vertical edge rule); each program DMAs its row-tile into
VMEM and performs the separable 5-tap stride-2 reduction as two *banded
constant matmuls* on the MXU:

* vertical:   acc = A_v @ tile,   A_v[r, j] = K[j - 2r]   (TR x rows_in)
* horizontal: out_blk = ya_blk @ M_h, M_h[r, c] = K[r - 2c]  (260 x 128)

Mosaic has no strided vector slicing, so decimation-by-2 cannot be done with
lane/sublane strides — but as matmuls the whole kernel uses only contiguous
slices, and the banded matrices cost ~40 GFLOP per 4K frame batch (noise for
the MXU) while the input is read from HBM exactly once.

Boundary-column corrections replicate the reference bit-for-bit, including
its row-parity quirk (fvvdp_lpyr_dec.py:198-205).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fovvideovdp_tpu.ops.pyramid import K5, ceildiv

_TR = 16    # output rows per program
_CB = 128   # output columns per horizontal matmul block


def _banded_vertical(TR: int, rows_in: int) -> np.ndarray:
    A = np.zeros((TR, rows_in), np.float32)
    for r in range(TR):
        for k in range(5):
            j = 2 * r + k
            if j < rows_in:
                A[r, j] = K5[k]
    return A


def _banded_horizontal() -> np.ndarray:
    M = np.zeros((2 * _CB + 4, _CB), np.float32)
    for c in range(_CB):
        for k in range(5):
            M[2 * c + k, c] = K5[k]
    return M


def _rows_copy(TR: int) -> int:
    # HBM DMA row slices must be aligned to the (8, 128) tiling
    return ceildiv(2 * TR + 3, 8) * 8


def _reduce_kernel(Av_ref, Mh_ref, xp_hbm, out_ref, scratch, sem,
                   *, H, W, TR, Wo, Wo_pad):
    """Grid (N, n_tiles); out block (1, TR, Wo_pad)."""
    n = pl.program_id(0)
    rt = pl.program_id(1)
    rows_copy = _rows_copy(TR)

    src = 2 * rt * TR  # padded-row index of input row (2*r0 - 2)
    cp = pltpu.make_async_copy(
        xp_hbm.at[n, pl.ds(src, rows_copy), :], scratch.at[:, :], sem)
    cp.start()
    cp.wait()

    # vertical 5-tap stride-2: acc[r, :] = sum_k K[k] * tile[2r + k, :]
    # (HIGHEST precision: the MXU's default bf16 passes would cost ~1e-3
    # relative error, far above the metric's parity tolerance)
    acc = jnp.dot(Av_ref[:, :], scratch[:, :],
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)       # (TR, Wp)

    # horizontal 5-tap stride-2 with zero padding:
    # ya[2 + j] = acc[j];  out[c] = sum_k K[k] * ya[2c + k]
    Wp = scratch.shape[1]
    pad_r = 2 * Wo_pad + 4 - 2 - Wp
    ya = jnp.concatenate(
        [jnp.zeros((TR, 2), acc.dtype), acc, jnp.zeros((TR, pad_r), acc.dtype)],
        axis=1)                                              # (TR, 2*Wo_pad+4)
    blocks = []
    for b in range(Wo_pad // _CB):
        ya_blk = jax.lax.slice(ya, (0, 2 * _CB * b),
                               (TR, 2 * _CB * b + 2 * _CB + 4))
        blocks.append(jnp.dot(ya_blk, Mh_ref[:, :],
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST))
    out = jnp.concatenate(blocks, axis=1)                    # (TR, Wo_pad)

    # boundary-column corrections (reference semantics incl. row-parity quirk)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (TR, Wo_pad), 1)
    first = acc[:, 0] * K5[1] + acc[:, 1] * K5[0]
    out = jnp.where(col_idx == 0, out + first[:, None], out)
    if H % 2 == 1:
        last = acc[:, W - 1] * K5[3] + acc[:, W - 2] * K5[4]
    else:
        last = acc[:, W - 1] * K5[4]
    out = jnp.where(col_idx == Wo - 1, out + last[:, None], out)

    out_ref[0, :, :] = out


def supports(H: int, W: int) -> bool:
    """Shapes the kernel handles; callers fall back to the jnp path otherwise."""
    TR = min(_TR, ceildiv(H, 2))
    # symmetric padding requires pad <= size; tiny levels use the fallback
    return H >= _rows_copy(TR) + 2 and W >= 128


def gausspyr_reduce_pallas(x: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W) -> (..., ceil(H/2), ceil(W/2)); numerics match
    ops.pyramid.gausspyr_reduce."""
    H, W = x.shape[-2], x.shape[-1]
    lead = x.shape[:-2]
    x3 = x.reshape((-1, H, W))
    N = x3.shape[0]

    Ho, Wo = ceildiv(H, 2), ceildiv(W, 2)
    TR = min(_TR, Ho)
    n_tiles = ceildiv(Ho, TR)
    rows_copy = _rows_copy(TR)
    Wo_pad = ceildiv(Wo, _CB) * _CB

    # padded row i == input row i - 2; bottom padding covers the last tile's
    # aligned DMA window.  The lane dim is zero-padded to the 128 tiling
    # (zero columns reproduce the reference's zero-padded column pass).
    pad_bottom = (2 * (n_tiles - 1) * TR + rows_copy) - H - 2
    Wp = ceildiv(W, 128) * 128
    xp = jnp.pad(x3, ((0, 0), (2, max(pad_bottom, 2)), (0, 0)), mode="symmetric")
    if Wp != W:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, Wp - W)))

    Av = jnp.asarray(_banded_vertical(TR, rows_copy))
    Mh = jnp.asarray(_banded_horizontal())

    from fovvideovdp_tpu.ops import pallas as pallas_cfg
    out = pl.pallas_call(
        functools.partial(_reduce_kernel, H=H, W=W, TR=TR, Wo=Wo, Wo_pad=Wo_pad),
        grid=(N, n_tiles),
        in_specs=[
            pl.BlockSpec((TR, rows_copy), lambda n, rt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * _CB + 4, _CB), lambda n, rt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, TR, Wo_pad), lambda n, rt: (n, rt, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, n_tiles * TR, Wo_pad), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows_copy, Wp), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=pallas_cfg.interpret_mode(),
    )(Av, Mh, xp)
    return out[:, :Ho, :Wo].reshape(lead + (Ho, Wo))
