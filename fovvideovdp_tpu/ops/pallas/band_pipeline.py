"""Fully-fused contrast-pyramid-level scorer (Pallas TPU kernel).

One VMEM pass per row-tile of the fine level computes the ENTIRE per-band
pipeline for both temporal channels and writes only per-tile partial sums —
the contrast band and L_bkg never touch HBM:

    expanded = gausspyr_expand(g_coarse)            # zero-interleave + 5-tap
    L_bkg    = clamp(expanded[bkg_ch], min=0.1)
    contrast = clamp((g_fine - expanded) / L_bkg, max=1000)
    u        = (log2(clip(L_bkg)) - y0) / dy        # uniform LUT coordinate
    ls_c     = interp(table_c, u) + log2(corr)      # log2 S per temp channel
    log2 D_c = p*(log2|T-R| + ls_c)                 # masking, log2 space
               - log2(1 + 2^(q_c*(log2 min(|T|,|R|) + ls_c + log2 c10)))
    out[c]   = sum over valid pixels of 2^(beta * min(log2 D_c, log2 1e4))

The sensitivity table already holds log2 values, so S is never
exponentiated and the three non-integer powers collapse into one exp2 —
5 transcendentals per channel pair instead of 7 plus a divide (measured
-2.5 ms on the 4K level-0 kernel); log2(0) = -inf flows through to an
exact 0, matching pow's D(0,0) = 0.  The table itself is range-trimmed by
the caller (csf.trim_lut_range) to the knots reachable for the display's
[0.1, Lpeak] background-luminance range (~19 of 32), and interpolated in
telescoped delta form — both shrink the per-pixel VPU loop.

This replaces the expand+contrast kernel (ops/pallas/expand.py) followed by
the band scorer (ops/pallas/band_score.py) on the default metric path,
saving the HBM write + re-read of the 4-channel contrast stack and L_bkg
per level (~4 GB per 4K block), plus one XLA pre-pad copy of the fine level.

Kernel shape choices (measured on v5e):
* Adaptive row-tile height (TRO up to 64) raises the matmuls' M dimension.
* Work streams through 256-column strips with running scalar accumulators,
  keeping live intermediates ~one strip wide (VMEM fits TRO=64).
  (A channel-stacked single-matmul variant with edge terms folded into
  per-tile constant matrices measured ~10% SLOWER — rejected.)

Semantics: pyfvvdp/fvvdp_lpyr_dec.py:246-273 (fused contrast pyramid) +
pyfvvdp/fvvdp.py:414-460 (CSF normalisation, mutual masking, beta pooling),
with the per-band gain folded into ``corr`` (everything downstream of the
contrast is linear in it until the absolute values).

Only used on the default path (non-foveated, no heatmap, both temporal
channels, shared-Y LUTs); the jnp composition is the fallback and gradient
rule, so ``jax.grad`` works through it.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fovvideovdp_tpu.ops.pyramid import (K5, ceildiv, _expand_contrast_jnp)
from fovvideovdp_tpu.ops.pallas.expand import _banded_expand
from fovvideovdp_tpu.ops.pallas import score_math
from fovvideovdp_tpu.ops.pallas.band_score import _band_score2_jnp
from fovvideovdp_tpu.ops.pallas.mxu import dot3 as _dot3

_CBO = 256  # fine cols per horizontal matmul block
_C = 4      # temporal-response channels [T-sust, R-sust, T-trans, R-trans]


def _pick_tro(H: int) -> int:
    """Fine rows per program: taller tiles raise the matmuls' M dimension
    (MXU utilisation).  A divisor of H is strongly preferred — otherwise the
    fine level needs an XLA row pre-pad, a full extra HBM copy (~2.8 ms for
    a 4K block).  Must be a multiple of 8 (Pallas block-shape rule)."""
    # For TRO % 16 != 0 the coarse DMA start (TRO/2)*rt is only 4-aligned on
    # odd tiles; the DMA start rounds down to 8 rows and the offset folds
    # into an rt-parity variant of the vertical matrix.
    for tro in (64, 56, 48, 40, 32, 24, 16):
        if H % tro == 0:
            return tro
    for tro in (64, 32):
        if H >= 2 * tro:
            return tro
    return 16


def _expand_score_kernel(Bv_ref, Mh_ref, tabs_ref, coarse_hbm, fine_ref,
                         out_ref, scratch, sem,
                         *, H, W, h2, w2, Wp, TRO, Hp, bkg_ch, y0, dy, Ymin,
                         Ymax, p, q_s, q_t, c10, corr, beta, n_grid,
                         n_in, direct, s_max, shared_delta):
    """Grid (F, ceil(H/TRO)); fine block (1, 4, TRO, Wp); out SMEM
    (F, n_tiles, 2) partial sums of D^beta.

    Two coarse-input layouts:
    * padded (direct=False): the caller pre-padded the coarse level with a
      leading zero row/col and trailing zeros (one full HBM copy); DMA
      starts round down to the 8-row tiling, the 0/4-row remainder baked
      into an rt-parity Bv variant.
    * direct (direct=True): the RAW coarse level is read — no pre-pad copy
      at all.  DMA starts are clamped to [0, s_max] so every window stays
      in bounds; the per-tile row offset (including the virtual leading
      zero row) is baked into a per-tile Bv matrix, and the virtual leading
      zero column into the Mh band (built by the caller)."""
    f = pl.program_id(0)
    rt = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    w2in = w2 if direct else (-(-(Wp // 2 + 2) // 128)) * 128

    # double-buffered coarse DMA: prefetch the next grid step's window while
    # this tile computes (starts written literally as 8*(...) for Mosaic's
    # divisibility prover)
    def dma_start(tt):
        if direct:
            return 8 * jnp.minimum(jnp.maximum(((TRO // 2) * tt - 1) // 8, 0),
                                   s_max // 8)
        return 8 * (((TRO // 2) * tt) // 8)

    def start_copy(ff, tt, slot):
        pltpu.make_async_copy(
            coarse_hbm.at[ff, :, pl.ds(dma_start(tt), n_in), :],
            scratch.at[slot], sem.at[slot]).start()

    step = f * n_tiles + rt
    slot = step % 2
    @pl.when(step == 0)
    def _():
        start_copy(f, rt, 0)
    nxt = step + 1
    @pl.when(nxt < pl.num_programs(0) * n_tiles)
    def _():
        start_copy(nxt // n_tiles, nxt % n_tiles, nxt % 2)
    pltpu.make_async_copy(
        coarse_hbm.at[0, :, pl.ds(0, n_in), :],
        scratch.at[slot], sem.at[slot]).wait()
    scratch = scratch.at[slot]

    # vertical Gaussian expand of all four channels
    # (ops/pallas/expand.py math; v planes are (TRO, w2in) — small)
    # scratch row l holds padded coarse row s_al + l
    s_al = dma_start(rt) + 1 if direct else 8 * (((TRO // 2) * rt) // 8)
    vs = []
    for ch in range(_C):
        v = _dot3(Bv_ref[0], scratch[ch])
        row_g = TRO * rt + jax.lax.broadcasted_iota(jnp.int32, (TRO, w2in), 0)
        x0 = scratch[ch][0 if direct else 1, :]
        v = jnp.where(jnp.logical_and(rt == 0, row_g == 0),
                      v + 2.0 * K5[0] * x0[None, :], v)
        i_last = h2 - s_al
        in_rng = jnp.logical_and(i_last >= 0, i_last < n_in)
        xl_row = scratch[ch, pl.ds(jnp.clip(i_last, 0, n_in - 1), 1), :]
        xl = jnp.where(in_rng, xl_row[0], jnp.zeros((w2in,), v.dtype))
        if H % 2 == 0:
            v = jnp.where(row_g == H - 1, v + 2.0 * K5[3] * xl[None, :], v)
            v = jnp.where(row_g == H - 2, v + 2.0 * K5[4] * xl[None, :], v)
        else:
            v = jnp.where(row_g == H - 1, v + 2.0 * K5[4] * xl[None, :], v)
        vs.append(v)

    # per column strip: horizontal expand, contrast, CSF, masking, beta
    # partials — live intermediates stay one strip wide.  Strips are _CBO
    # wide with an optional 128-wide ragged tail, so any 128-multiple level
    # width (e.g. 1920) avoids an XLA column pre-pad of the fine level.
    strips = [(s, min(_CBO, Wp - s)) for s in range(0, Wp, _CBO)]
    acc_s = jnp.zeros((), jnp.float32)
    acc_t = jnp.zeros((), jnp.float32)
    for start, cw in strips:
        row_v = TRO * rt + jax.lax.broadcasted_iota(jnp.int32, (TRO, cw), 0)
        col_g = start + jax.lax.broadcasted_iota(jnp.int32, (TRO, cw), 1)
        # the banded matrix is translation-invariant, so each strip uses a
        # top-left sub-block of Mh.  Direct mode's band is pre-shifted for
        # the missing leading zero column; its last strip drops one matrix
        # row so no read goes past the raw coarse width (the dropped
        # contributions are exactly the zero-pad terms the explicit edge
        # corrections already account for).
        if direct:
            nmh = cw // 2 + (0 if start + cw == Wp else 1)
        else:
            nmh = cw // 2 + 2
        es = []
        for ch in range(_C):
            v = vs[ch]
            v_blk = jax.lax.slice(v, (0, start // 2),
                                  (TRO, start // 2 + nmh))
            e = _dot3(v_blk, Mh_ref[:nmh, :cw])
            # horizontal interleave edge terms (padded col q = x col q-1)
            if start == 0:
                xcol0 = v[:, 0:1] if direct else v[:, 1:2]
                e = jnp.where(col_g == 0, e + 2.0 * K5[0] * xcol0, e)
            if start + cw > W - 2:
                vlast = v[:, w2 - 1:w2] if direct else v[:, w2:w2 + 1]
                if W % 2 == 0:
                    e = jnp.where(col_g == W - 1, e + 2.0 * K5[3] * vlast, e)
                    e = jnp.where(col_g == W - 2, e + 2.0 * K5[4] * vlast, e)
                else:
                    e = jnp.where(col_g == W - 1, e + 2.0 * K5[4] * vlast, e)
            es.append(e)

        lbkg = jnp.maximum(es[bkg_ch], 0.1)
        fine = fine_ref[0, :, :, start:start + cw]
        # contrast stays UN-normalised: T - R and min(|T|, |R|) are
        # homogeneous in 1/L_bkg and log2(L_bkg) is needed for the LUT
        # coordinate anyway, so the four per-pixel divides become one
        # subtraction folded into the sensitivity term below.  The
        # reference's one-sided clip(contrast, max=1000) moves to
        # min(d, 1000 * L_bkg) (exact: L_bkg > 0).
        ll = jnp.log2(lbkg)
        cap = 1000.0 * lbkg
        con = [jnp.minimum(fine[ch] - es[ch], cap) for ch in range(_C)]

        # piecewise-linear LUT lookup in telescoped delta form (shared
        # score_math; shared_delta folds the omega=5 modulation into one
        # scalar offset)
        lYmin = float(np.log2(Ymin))
        lYmax = float(np.log2(Ymax))
        u = (jnp.clip(ll, lYmin, lYmax) - y0) / dy
        u = jnp.clip(u, 0.0, float(n_grid - 1))
        # dynamic knot window: only the knots this strip's L_bkg range
        # reaches are accumulated (tables live in SMEM for the dynamically
        # indexed scalar loads) — typically 2-6 of the ~19 weightable knots
        s_s, s_t = score_math.table_interp_delta_dyn(
            tabs_ref, u, n_grid, 2, shared_delta=shared_delta)

        # padded row/col fringe must not contribute to the norm; when the
        # tile grid matches the level exactly (divisor TRO, aligned W) there
        # is no fringe and the mask compiles away
        need_row_mask = Hp != H
        need_col_mask = Wp != W and start + cw > W
        if need_row_mask and need_col_mask:
            valid = jnp.logical_and(row_v < H, col_g < W)
        elif need_row_mask:
            valid = row_v < H
        elif need_col_mask:
            valid = col_g < W
        else:
            valid = None
        # log2-space masking (shared score_math.d_beta_log2)
        lcorr = float(np.log2(corr))
        lc10 = float(np.log2(c10))
        for T, R, s_log, q, is_t in ((con[0], con[1], s_s, q_s, False),
                                     (con[2], con[3], s_t, q_t, True)):
            # T/R are un-normalised (see above): dividing by L_bkg is the
            # subtraction of ll here
            D_b = score_math.d_beta_log2(T, R, s_log + lcorr - ll,
                                         p, q, lc10, beta)
            if valid is not None:
                D_b = jnp.where(valid, D_b, 0.0)
            part = jnp.sum(D_b)
            if is_t:
                acc_t = acc_t + part
            else:
                acc_s = acc_s + part

    out_ref[f, rt, 0] = acc_s
    out_ref[f, rt, 1] = acc_t


def supports(H: int, W: int) -> bool:
    from fovvideovdp_tpu.ops.pallas import expand as pallas_expand
    return pallas_expand.supports(H, W)


@functools.partial(jax.jit, static_argnames=("bkg_channel", "meta2",
                                              "shared_delta", "interpret"))
def _expand_score2_call(g_fine, g_coarse, tables, bkg_channel, meta2,
                        shared_delta=False, interpret=False):
    y0, dy, Ymin, Ymax, p, q_s, q_t, c10, corr, beta = meta2
    F, C, H, W = g_fine.shape
    h2, w2 = g_coarse.shape[-2], g_coarse.shape[-1]
    TRO = _pick_tro(H)
    n_tiles = ceildiv(H, TRO)
    # 128-granular width (ragged tail strip in-kernel) and lane-aligned
    # scratch width: a 1920-wide level needs no column pre-pad at all
    Wp = ceildiv(W, 128) * 128
    Hp = n_tiles * TRO
    fpad = g_fine if (Hp == H and Wp == W) else jnp.pad(
        g_fine, ((0, 0), (0, 0), (0, Hp - H), (0, Wp - W)))

    # Direct coarse mode: skip the coarse pre-pad copy entirely when the raw
    # level can be DMA'd as-is — per-tile row windows clamped into [0, s_max]
    # (offsets absorbed by per-tile Bv matrices) and a lane-aligned width.
    K5a = np.asarray(K5, np.float32)
    direct = (Wp == W and W % 2 == 0 and w2 == W // 2 and w2 % 128 == 0
              and h2 >= 16)
    s_list = []
    s_max = 0
    if direct:
        n_in = -8 * (-(TRO // 2 + 8) // 8)
        ok = False
        for _ in range(16):
            s_max = 8 * ((h2 - n_in) // 8)
            if s_max < 0:
                break
            s_list = [min(max(0, 8 * (((TRO // 2) * rt - 1) // 8)), s_max)
                      for rt in range(n_tiles)]
            lmax = max(min((TRO // 2) * rt + (TRO + 3) // 2, h2) - s - 1
                       for rt, s in enumerate(s_list))
            need = -8 * (-(lmax + 1) // 8)
            if need <= n_in:
                ok = True
                break
            n_in = need
        direct = ok

    if direct:
        coarse_in = g_coarse
        w2in = w2
        # Bv[rt][j, l]: scratch row l holds raw coarse row s_list[rt] + l,
        # i.e. padded row s+l+1; band k = 2*(p - (TRO/2)*rt) - j
        ll = np.arange(n_in)[None, None, :]
        jj = np.arange(TRO)[None, :, None]
        ss = np.asarray(s_list)[:, None, None]
        QQ = (TRO // 2) * np.arange(n_tiles)[:, None, None]
        kk = 2 * (ss + ll + 1 - QQ) - jj
        Bv = jnp.asarray(np.where((kk >= 0) & (kk <= 4),
                                  2.0 * K5a[np.clip(kk, 0, 4)],
                                  0.0).astype(np.float32))
        # Mh band pre-shifted for the missing leading zero column:
        # e[j] += 2K[2m + 2 - j] * scratch_col[m]
        mm = np.arange(_CBO // 2 + 2)[:, None]
        jm = np.arange(_CBO)[None, :]
        km = 2 * mm + 2 - jm
        Mh_np = np.where((km >= 0) & (km <= 4), 2.0 * K5a[np.clip(km, 0, 4)],
                         0.0).astype(np.float32)
        Mh = jnp.asarray(Mh_np)
        bv_index = lambda f, rt: (rt, 0, 0)
    else:
        n_in = -8 * (-(TRO // 2 + 8) // 8)  # 8-aligned DMA window length
        w2in = ceildiv(Wp // 2 + 2, 128) * 128
        rows_needed = (TRO // 2) * (n_tiles - 1) + n_in
        coarse_in = jnp.pad(g_coarse, ((0, 0), (0, 0),
                                       (1, max(rows_needed - h2 - 1, 0)),
                                       (1, w2in - w2 - 1)))

        # rt-parity vertical variants: padded coarse row p sits at scratch
        # row p - s_al, so the band shifts by the 0/4-row DMA remainder
        def _bv(off):
            B = np.zeros((TRO, n_in), np.float32)
            for j in range(TRO):
                for l in range(n_in):
                    k = 2 * (l - off) - j
                    if 0 <= k <= 4:
                        B[j, l] = 2.0 * K5[k]
            return B
        if TRO % 16 == 0:
            Bv = jnp.asarray(_bv(0)[None])
            bv_index = lambda f, rt: (0, 0, 0)
        else:
            Bv = jnp.asarray(np.stack([_bv(0), _bv(4)]))
            bv_index = lambda f, rt: (rt % 2, 0, 0)
        Mh = jnp.asarray(_banded_expand(_CBO // 2 + 2, _CBO))

    n_grid = tables.shape[1]
    partials = pl.pallas_call(
        functools.partial(_expand_score_kernel, H=H, W=W, h2=h2, w2=w2,
                          Wp=Wp, TRO=TRO, Hp=Hp, bkg_ch=bkg_channel, y0=y0,
                          dy=dy, Ymin=Ymin, Ymax=Ymax, p=p, q_s=q_s, q_t=q_t,
                          c10=c10, corr=corr, beta=beta, n_grid=n_grid,
                          n_in=n_in, direct=direct, s_max=s_max,
                          shared_delta=shared_delta),
        grid=(F, n_tiles),
        in_specs=[
            pl.BlockSpec((1, TRO, n_in), bv_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_CBO // 2 + 2, _CBO), lambda f, rt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, n_grid), lambda f, rt: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, C, TRO, Wp), lambda f, rt: (f, 0, rt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((F, n_tiles, 2), lambda f, rt: (0, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((F, n_tiles, 2), g_fine.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, C, n_in, w2in), g_fine.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(Bv, Mh, tables, coarse_in, fpad)
    return jnp.sum(partials, axis=1)  # (F, 2) sums of D^beta


def _expand_score2_jnp(g_fine, g_coarse, tables, bkg_channel, meta2):
    """jnp composition with identical math (fallback + gradient rule)."""
    size = (g_fine.shape[-2], g_fine.shape[-1])
    contrast, L_bkg = _expand_contrast_jnp(g_fine, g_coarse, size, bkg_channel)
    return _band_score2_jnp(contrast[:, 0], contrast[:, 1], contrast[:, 2],
                            contrast[:, 3], L_bkg[:, 0], tables, meta2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _expand_score2(g_fine, g_coarse, tables, bkg_channel, meta2,
                   shared_delta=False):
    from fovvideovdp_tpu.ops import pallas as pallas_cfg
    return _expand_score2_call(g_fine, g_coarse, tables, bkg_channel, meta2,
                               shared_delta=shared_delta,
                               interpret=pallas_cfg.interpret_mode())


def _es2_fwd(g_fine, g_coarse, tables, bkg_channel, meta2,
             shared_delta=False):
    return _expand_score2(g_fine, g_coarse, tables, bkg_channel, meta2,
                          shared_delta), \
        (g_fine, g_coarse, tables)


def _es2_bwd(bkg_channel, meta2, shared_delta, res, g):
    g_fine, g_coarse, tables = res
    _, vjp = jax.vjp(
        lambda a, b, t: _expand_score2_jnp(a, b, t, bkg_channel, meta2),
        g_fine, g_coarse, tables)
    return vjp(g)


_expand_score2.defvjp(_es2_fwd, _es2_bwd)


def expand_score2(g_fine, g_coarse, tables, lut, p, q_sust, q_trans,
                  mask_c, sens_corr, beta, bkg_channel=1):
    """Fused expand + contrast + two-channel band scoring for one level.

    g_fine (F, 4, H, W) / g_coarse (F, 4, ceil(H/2), ceil(W/2)): Gaussian
    levels of the temporal-response stack [T-sust, R-sust, T-trans, R-trans];
    tables: (2, n) pre-reduced S_log(Y_log) tables (sustained, transient —
    both LUTs must share the Y grid); ``sens_corr`` should include the
    per-band gain.  Returns (F, 2) per-frame sums over valid pixels of
    D^beta — identical to scoring the materialised contrast band with
    band_score2_pallas.

    Dispatches to the Pallas kernel on TPU for supported shapes with the jnp
    composition as fallback (and as the gradient rule either way)."""
    Y_log = np.asarray(lut["Y_log"])
    Y = np.asarray(lut["Y"])
    meta2 = (float(Y_log[0]),
             float((Y_log[-1] - Y_log[0]) / (Y_log.shape[0] - 1)),
             float(Y[0]), float(Y[-1]),
             float(p), float(q_sust), float(q_trans),
             float(10.0 ** mask_c), float(sens_corr), float(beta))
    tabs_np = np.asarray(tables)
    # the shipped o0/o5 LUT pair differs by a constant log2-S offset (the
    # temporal modulation factors out of the Daly CSF); when that holds the
    # kernel interpolates once and offsets, halving the CSF FMA count
    shared = bool(np.ptp(tabs_np[1] - tabs_np[0]) <= 2e-5)
    tabs = jnp.asarray(tables)
    from fovvideovdp_tpu.ops import pallas as pallas_cfg
    H, W = g_fine.shape[-2], g_fine.shape[-1]
    if (g_fine.dtype == jnp.float32 and pallas_cfg.use_pallas()
            and supports(H, W)):
        return _expand_score2(g_fine, g_coarse, tabs, int(bkg_channel), meta2,
                              shared)
    return _expand_score2_jnp(g_fine, g_coarse, tabs, int(bkg_channel), meta2)
