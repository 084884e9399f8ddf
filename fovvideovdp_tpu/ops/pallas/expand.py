"""Fused Gaussian-expand + Laplacian + Weber-contrast Pallas TPU kernel.

Computes, in one pass per row-tile of the fine level:

    expanded = gausspyr_expand(g_coarse)           # zero-interleave + 5-tap
    L_bkg    = clamp(expanded[bkg_ch], min=0.1)
    contrast = clamp((g_fine - expanded) / L_bkg, max=1000)

which is the body of the fused contrast pyramid (fvvdp_lpyr_dec.py:246-273).
Both expansion passes are banded constant matmuls (Mosaic has no strided
vector ops): out[j] = sum_i 2K[2*i_loc - j_loc] * in[i_loc] over a 3-wide
band, plus the reference's zero-interleave edge terms applied as masked
adds.  The coarse level is zero-padded in XLA (zero entries reproduce the
interleave's implicit zeros); channels stay together per tile so the
background-luminance division fuses with the expansion.
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

_TRO = 16   # fine rows per program
_CBO = 256  # fine cols per horizontal matmul block


def _banded_expand(n_in: int, n_out: int) -> np.ndarray:
    """M[i, j] = 2*K[2i - j] on the band 0 <= 2i - j <= 4.

    With in[i_loc] = x[start + i_loc - 1] (one leading zero row/col), this
    reproduces out[j] = sum_k 2K[k] * z[j + k] for the zero-interleaved z."""
    M = np.zeros((n_in, n_out), np.float32)
    for i in range(n_in):
        for j in range(n_out):
            k = 2 * i - j
            if 0 <= k <= 4:
                M[i, j] = 2.0 * K5[k]
    return M


def _expand_contrast_kernel(Bv_ref, Mh_ref, coarse_hbm, fine_ref,
                            contrast_ref, lbkg_ref, scratch, sem,
                            *, H, W, h2, w2, Wp, C, bkg_ch):
    """Grid (F, ceil(H/TRO)); fine/contrast blocks (1, C, TRO, Wp)."""
    f = pl.program_id(0)
    rt = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    w2in = Wp // 2 + 128

    # coarse rows [8*rt, 8*rt+16) of the padded level (padded row p = x row p-1)
    cp = pltpu.make_async_copy(
        coarse_hbm.at[f, :, pl.ds(8 * rt, 16), :], scratch.at[:, :, :], sem)
    cp.start()
    cp.wait()

    outs = []
    lbkg = None
    for ch in range(C):
        # vertical expand: (TRO, 16) @ (16, w2in); Bv[j, i] = 2K[2i - j]
        v = _dot3(Bv_ref[:, :], scratch[ch])

        # vertical interleave edge terms (fvvdp_lpyr_dec.py:126-142):
        #   z[0] = x[0]          -> out[0]   += 2K[0] * x[0]
        #   even H: z[H+2]=x[-1] -> out[H-1] += 2K[3]*x[-1]; out[H-2] += 2K[4]*x[-1]
        #   odd  H: z[H+3]=x[-1] -> out[H-1] += 2K[4]*x[-1]
        row_g = _TRO * rt + jax.lax.broadcasted_iota(jnp.int32, (_TRO, w2in), 0)
        x0 = scratch[ch][1, :]                 # x[0] (padded row 1), tile 0 only
        v = jnp.where(jnp.logical_and(rt == 0, row_g == 0),
                      v + 2.0 * K5[0] * x0[None, :], v)
        i_last = h2 - 8 * rt                   # padded-row index of x[h2-1]
        in_rng = jnp.logical_and(i_last >= 0, i_last < 16)
        # dynamic-start ref read (dynamic_slice on values is not lowerable)
        xl_row = scratch[ch, pl.ds(jnp.clip(i_last, 0, 15), 1), :]
        xl = jnp.where(in_rng, xl_row[0], jnp.zeros((w2in,), v.dtype))
        if H % 2 == 0:
            v = jnp.where(row_g == H - 1, v + 2.0 * K5[3] * xl[None, :], v)
            v = jnp.where(row_g == H - 2, v + 2.0 * K5[4] * xl[None, :], v)
        else:
            v = jnp.where(row_g == H - 1, v + 2.0 * K5[4] * xl[None, :], v)

        # horizontal expand: per 256-col block, (TRO, 130) @ (130, 256).
        # v's columns are already in padded coords (col 0 is the interleave
        # zero; col q holds x col q-1), so tap slices come straight from v.
        blocks = []
        for b in range(Wp // _CBO):
            v_blk = jax.lax.slice(v, (0, (_CBO // 2) * b),
                                  (_TRO, (_CBO // 2) * b + _CBO // 2 + 2))
            blocks.append(_dot3(v_blk, Mh_ref[:, :]))
        e = jnp.concatenate(blocks, axis=1)    # (TRO, Wp)

        # horizontal interleave edge terms (padded col q = x col q-1)
        col_g = jax.lax.broadcasted_iota(jnp.int32, (_TRO, Wp), 1)
        e = jnp.where(col_g == 0, e + 2.0 * K5[0] * v[:, 1:2], e)
        vlast = v[:, w2:w2 + 1]
        if W % 2 == 0:
            e = jnp.where(col_g == W - 1, e + 2.0 * K5[3] * vlast, e)
            e = jnp.where(col_g == W - 2, e + 2.0 * K5[4] * vlast, e)
        else:
            e = jnp.where(col_g == W - 1, e + 2.0 * K5[4] * vlast, e)

        outs.append(e)
        if ch == bkg_ch:
            lbkg = jnp.maximum(e, 0.1)

    lbkg_ref[0, :, :] = lbkg
    for ch in range(C):
        contrast_ref[0, ch, :, :] = jnp.minimum(
            (fine_ref[0, ch] - outs[ch]) / lbkg, 1000.0)


def supports(H: int, W: int) -> bool:
    return H >= 32 and W >= 128 and H % _TRO != 1


def expand_contrast_pallas(g_fine: jnp.ndarray, g_coarse: jnp.ndarray,
                           bkg_channel: int = 1):
    """Fused contrast-pyramid level.

    g_fine (F, C, H, W), g_coarse (F, C, ceil(H/2), ceil(W/2)) ->
    (contrast (F, C, H, W), L_bkg (F, 1, H, W)); numerics match the jnp
    composition in PyramidPlan.decompose_contrast."""
    F, C, H, W = g_fine.shape
    h2, w2 = g_coarse.shape[-2], g_coarse.shape[-1]
    n_tiles = ceildiv(H, _TRO)
    Wp = ceildiv(W, _CBO) * _CBO
    w2in = Wp // 2 + 128

    # padded coarse: one zero row/col in front (interleave zeros), zero fill
    # to the aligned DMA extent
    rows_needed = 8 * (n_tiles - 1) + 16
    cpad = jnp.pad(g_coarse, ((0, 0), (0, 0),
                              (1, max(rows_needed - h2 - 1, 0)),
                              (1, w2in - w2 - 1)))
    fpad = jnp.pad(g_fine, ((0, 0), (0, 0), (0, n_tiles * _TRO - H),
                            (0, Wp - W)))

    Bv = jnp.asarray(_banded_expand(16, _TRO).T)  # Bv[j, i] = 2K[2i - j]
    Mh = jnp.asarray(_banded_expand(_CBO // 2 + 2, _CBO))

    from fovvideovdp_tpu.ops import pallas as pallas_cfg
    contrast, lbkg = pl.pallas_call(
        functools.partial(_expand_contrast_kernel, H=H, W=W, h2=h2, w2=w2,
                          Wp=Wp, C=C, bkg_ch=bkg_channel),
        grid=(F, n_tiles),
        in_specs=[
            pl.BlockSpec((_TRO, 16), lambda f, rt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_CBO // 2 + 2, _CBO), lambda f, rt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, C, _TRO, Wp), lambda f, rt: (f, 0, rt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, C, _TRO, Wp), lambda f, rt: (f, 0, rt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TRO, Wp), lambda f, rt: (f, rt, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((F, C, n_tiles * _TRO, Wp), g_fine.dtype),
            jax.ShapeDtypeStruct((F, n_tiles * _TRO, Wp), g_fine.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((C, 16, w2in), g_fine.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=pallas_cfg.interpret_mode(),
    )(Bv, Mh, cpad, fpad)
    return (contrast[:, :, :H, :W], lbkg[:, None, :H, :W])
