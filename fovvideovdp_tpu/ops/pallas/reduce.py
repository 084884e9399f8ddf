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

from fovvideovdp_tpu.ops.pallas.mxu import dot3 as _dot3

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


def _horizontal_pass(acc, Mh_ref, TR, H, W, Wo, Wo_pad):
    """Horizontal 5-tap stride-2 via banded matmuls, with the boundary-column
    corrections (reference semantics incl. the row-parity quirk — the H-odd
    branch compiles out for even heights).  Shared by the padded and no-pad
    reduce kernels so an edge-rule change cannot desynchronise them."""
    Wp = acc.shape[1]
    pad_r = 2 * Wo_pad + 4 - 2 - Wp
    ya = jnp.concatenate(
        [jnp.zeros((TR, 2), acc.dtype), acc, jnp.zeros((TR, pad_r), acc.dtype)],
        axis=1)                                              # (TR, 2*Wo_pad+4)
    blocks = []
    for b in range(Wo_pad // _CB):
        ya_blk = jax.lax.slice(ya, (0, 2 * _CB * b),
                               (TR, 2 * _CB * b + 2 * _CB + 4))
        blocks.append(_dot3(ya_blk, Mh_ref[:, :]))
    out = jnp.concatenate(blocks, axis=1)                    # (TR, Wo_pad)

    col_idx = jax.lax.broadcasted_iota(jnp.int32, (TR, Wo_pad), 1)
    first = acc[:, 0] * K5[1] + acc[:, 1] * K5[0]
    out = jnp.where(col_idx == 0, out + first[:, None], out)
    if H % 2 == 1:
        last = acc[:, W - 1] * K5[3] + acc[:, W - 2] * K5[4]
    else:
        last = acc[:, W - 1] * K5[4]
    return jnp.where(col_idx == Wo - 1, out + last[:, None], out)


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
    # (bf16x3 split: fp32 accuracy at ~half the HIGHEST MXU passes — see
    # ops/pallas/mxu.py; DEFAULT's single bf16 pass would cost ~1e-3
    # relative error, far above the metric's parity tolerance)
    acc = _dot3(Av_ref[:, :], scratch[:, :])                 # (TR, Wp)

    out_ref[0, :, :] = _horizontal_pass(acc, Mh_ref, TR, H, W, Wo, Wo_pad)


def supports(H: int, W: int) -> bool:
    """Shapes the kernel handles; callers fall back to the jnp path otherwise."""
    TR = min(_TR, ceildiv(H, 2))
    # symmetric padding requires pad <= size; tiny levels use the fallback
    return H >= _rows_copy(TR) + 2 and W >= 128


# ---------------------------------------------------------------------------
# No-pre-pad fast path: the XLA symmetric pad costs a full extra copy of the
# input (~2.8 ms per 4K block).  For 8-aligned heights the kernel reads the
# UNPADDED input directly — DMA windows are 8-row-aligned with overfetch, and
# the symmetric top mirror / bottom edge terms fold into per-tile-position
# constant matrices (top / interior / bottom, selected by the BlockSpec index
# map).  Input DMAs are double-buffered across grid steps.
# ---------------------------------------------------------------------------

def _pick_tr_nopad(Ho: int) -> int:
    """Output rows per program; prefer a divisor of Ho so the kernel output
    needs no row slice (an XLA slice is another full copy)."""
    # output blocks are (1, TR, Wo_pad): Pallas requires TR % 8 == 0
    for tr in (64, 56, 48, 40, 32, 24, 16):
        if Ho % tr == 0:
            return tr
    return 16


def _vertical_variants_nopad(TR: int, rows2: int, H: int, Ho: int,
                             n_tiles: int) -> np.ndarray:
    """(3, TR, rows2) vertical matrices for [top, interior, bottom] tiles.

    Interior/bottom tiles DMA input rows [2*rt*TR - 8, ...): local row l maps
    to global 2*rt*TR - 8 + l, so out j takes K[l - 2j - 6].  The top tile
    DMAs from row 0 (K[l - 2j + 2]) with the symmetric mirror rows -1 -> x0,
    -2 -> x1 folded in; the bottom tile adds the reference's even-H edge term
    (row H -> x[H-1]; odd H is excluded by the 8-aligned-H gate)."""
    top = np.zeros((TR, rows2), np.float32)
    for r in range(TR):
        for k in range(5):
            j = 2 * r + k - 2
            if j >= 0:
                top[r, j] += K5[k]
            else:
                top[r, -1 - j] += K5[k]     # mirror: -1 -> x0, -2 -> x1
    mid = np.zeros((TR, rows2), np.float32)
    for r in range(TR):
        for k in range(5):
            mid[r, 2 * r + k + 6] += K5[k]
    bot = mid.copy()
    s_al = 2 * (n_tiles - 1) * TR - 8
    j_last = Ho - 1 - (n_tiles - 1) * TR    # local out row of Ho-1
    # H even: out[Ho-1] needs input row H (= 2*(Ho-1) + 2), mirrored to H-1
    if 2 * (Ho - 1) + 2 >= H and 0 <= j_last < TR:
        bot[j_last, H - 1 - s_al] += K5[4]
    # zero any tap falling outside the bottom tile's shorter DMA window
    L_bot = H - s_al
    bot[:, L_bot:] = 0.0
    return np.stack([top, mid, bot])


def _reduce_kernel_nopad(Av_ref, Mh_ref, x_hbm, out_ref, scratch, sem,
                         *, H, W, TR, Wo, Wo_pad, rows2, L_bot, n_tiles, N):
    """Grid (N, n_tiles); double-buffered input DMAs from the unpadded x."""
    n = pl.program_id(0)
    rt = pl.program_id(1)

    def start_copy(nn, tt, slot):
        # top tile reads [0, rows2); others read [2*tt*TR - 8, ...) with the
        # bottom tile's window clipped to the array
        @pl.when(tt == 0)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[nn, pl.ds(0, rows2), :],
                scratch.at[slot], sem.at[slot]).start()
        # written as 8*(...) so Mosaic's divisibility prover accepts the
        # dynamic 8-aligned row offset (TR is a multiple of 4)
        start8 = 8 * (tt * (TR // 4) - 1)
        @pl.when(jnp.logical_and(tt > 0, tt < n_tiles - 1))
        def _():
            pltpu.make_async_copy(
                x_hbm.at[nn, pl.ds(start8, rows2), :],
                scratch.at[slot], sem.at[slot]).start()
        @pl.when(jnp.logical_and(tt > 0, tt == n_tiles - 1))
        def _():
            pltpu.make_async_copy(
                x_hbm.at[nn, pl.ds(start8, L_bot), :],
                scratch.at[slot, pl.ds(0, L_bot)], sem.at[slot]).start()

    step = n * n_tiles + rt
    slot = step % 2
    @pl.when(step == 0)
    def _():
        start_copy(n, rt, 0)
    # prefetch the next grid step's window into the other buffer
    nxt = step + 1
    @pl.when(nxt < N * n_tiles)
    def _():
        start_copy(nxt // n_tiles, nxt % n_tiles, nxt % 2)

    def wait(tt, slot):
        @pl.when(jnp.logical_or(tt == 0, tt < n_tiles - 1))
        def _():
            pltpu.make_async_copy(
                x_hbm.at[0, pl.ds(0, rows2), :],
                scratch.at[slot], sem.at[slot]).wait()
        @pl.when(jnp.logical_and(tt > 0, tt == n_tiles - 1))
        def _():
            pltpu.make_async_copy(
                x_hbm.at[0, pl.ds(0, L_bot), :],
                scratch.at[slot, pl.ds(0, L_bot)], sem.at[slot]).wait()

    wait(rt, slot)
    if L_bot < rows2:
        # the bottom tile's shorter DMA leaves scratch rows [L_bot, rows2)
        # unwritten; A_bot zeroes their columns, but 0 * NaN = NaN if the
        # VMEM was never initialised (e.g. a 2-tile level's first visit)
        @pl.when(rt == n_tiles - 1)
        def _():
            scratch[slot, pl.ds(L_bot, rows2 - L_bot)] = jnp.zeros(
                (rows2 - L_bot, scratch.shape[2]), scratch.dtype)
    tile = scratch[slot]

    acc = _dot3(Av_ref[0], tile)                             # (TR, Wp)

    out_ref[0, :, :] = _horizontal_pass(acc, Mh_ref, TR, H, W, Wo, Wo_pad)


def _nopad_geometry(H: int, W: int):
    """Returns (TR, rows2, n_tiles, L_bot) for the no-pad path, or None if
    the shape needs the padded path."""
    if H % 8 != 0 or W % 128 != 0:
        return None
    Ho = H // 2
    TR = _pick_tr_nopad(Ho)
    n_tiles = ceildiv(Ho, TR)
    rows2 = 2 * TR + 16
    if n_tiles < 2 or H < rows2:
        return None
    L_bot = H - (2 * (n_tiles - 1) * TR - 8)
    if L_bot <= 0 or L_bot > rows2:
        return None
    return TR, rows2, n_tiles, L_bot


def _gausspyr_reduce_nopad(x3: jnp.ndarray, geom) -> jnp.ndarray:
    N, H, W = x3.shape
    TR, rows2, n_tiles, L_bot = geom
    Ho, Wo = H // 2, ceildiv(W, 2)
    Wo_pad = ceildiv(Wo, _CB) * _CB

    Av = jnp.asarray(_vertical_variants_nopad(TR, rows2, H, Ho, n_tiles))
    Mh = jnp.asarray(_banded_horizontal())

    from fovvideovdp_tpu.ops import pallas as pallas_cfg
    last = n_tiles - 1
    out = pl.pallas_call(
        functools.partial(_reduce_kernel_nopad, H=H, W=W, TR=TR, Wo=Wo,
                          Wo_pad=Wo_pad, rows2=rows2, L_bot=L_bot,
                          n_tiles=n_tiles, N=N),
        grid=(N, n_tiles),
        in_specs=[
            pl.BlockSpec((1, TR, rows2),
                         lambda n, rt: (jnp.where(rt == 0, 0,
                                                  jnp.where(rt == last, 2, 1)),
                                        0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * _CB + 4, _CB), lambda n, rt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, TR, Wo_pad), lambda n, rt: (n, rt, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, n_tiles * TR, Wo_pad), x3.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, rows2, W), x3.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=pallas_cfg.interpret_mode(),
    )(Av, Mh, x3)
    if n_tiles * TR != Ho or Wo_pad != Wo:
        out = out[:, :Ho, :Wo]
    return out


def gausspyr_reduce_pallas(x: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W) -> (..., ceil(H/2), ceil(W/2)); numerics match
    ops.pyramid.gausspyr_reduce."""
    H, W = x.shape[-2], x.shape[-1]
    lead = x.shape[:-2]
    x3 = x.reshape((-1, H, W))
    N = x3.shape[0]

    geom = _nopad_geometry(H, W)
    if geom is not None:
        out = _gausspyr_reduce_nopad(x3, geom)
        return out.reshape(lead + out.shape[-2:])

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
