"""Fused CSF + masking + beta-norm band scorer (Pallas TPU kernel).

For one (band, temporal-channel) pair this computes, in a single VMEM pass
over the band:

    u   = (log2(clip(L_bkg)) - y0) / dy                 # uniform LUT coord
    S   = 2^interp(table, u) * sensitivity_correction   # CSF sensitivity
    T'  = T * S;  R' = R * S                            # threshold units
    M   = 10^mask_c * min(|T'|, |R'|)                   # mutual masking
    D   = min(|T' - R'|^p / (1 + M^q), 1e4)             # visual difference
    out = sum over tile of D^beta                       # norm partial

The table interpolation is an unrolled piecewise-linear accumulation in
telescoped delta form on the VPU — the XLA one-hot formulation
materialises an (npix, n) intermediate in HBM, which dominates the
stage's runtime — and the masking chain is evaluated in log2 space (see
band_pipeline._expand_score_kernel for the derivation and measurements).
Partial sums per row-tile are reduced to the final
(sum D^beta)^(1/beta) / npix^(1/beta) in XLA.

Only used on the default path (non-foveated, no heatmap); the jnp
composition in core.score_frames is the fallback and the gradient rule.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fovvideovdp_tpu.ops.pallas import score_math
from fovvideovdp_tpu.ops.pyramid import ceildiv

_TR = 32  # rows per program (3 input blocks + temporaries must fit VMEM)


def _band_score_kernel(t32_ref, T_ref, R_ref, L_ref, out_ref,
                       *, y0, dy, Ymin, Ymax, p, q, c10, corr, beta, n_grid):
    f = pl.program_id(0)
    rt = pl.program_id(1)
    T = T_ref[0]
    R = R_ref[0]
    L = L_ref[0]

    # delta-form table lookup + log2-space masking (shared score_math)
    u = (jnp.log2(jnp.clip(L, Ymin, Ymax)) - y0) / dy
    u = jnp.clip(u, 0.0, float(n_grid - 1))
    (s_log,) = score_math.table_interp_delta((t32_ref[0],), u, n_grid)

    D_b = score_math.d_beta_log2(T, R, s_log + float(np.log2(corr)),
                                 p, q, float(np.log2(c10)), beta)
    out_ref[f, rt] = jnp.sum(D_b)


def supports(h: int, w: int) -> bool:
    return w >= 128 and h >= 8


def _band_score2_kernel(tabs_ref, Ts_ref, Rs_ref, Tt_ref, Rt_ref, L_ref,
                        out_ref, *, y0, dy, Ymin, Ymax, p, q_s, q_t, c10,
                        corr, beta, n_grid):
    """Both temporal channels in one pass: the LUT coordinate u and the 32
    hat weights depend only on L_bkg, which the channels share — computing
    them once halves the dominant VPU cost of the stage (and L is read from
    HBM once instead of twice)."""
    f = pl.program_id(0)
    rt = pl.program_id(1)
    L = L_ref[0]

    # delta-form table lookup + log2-space masking (shared score_math)
    u = (jnp.log2(jnp.clip(L, Ymin, Ymax)) - y0) / dy
    u = jnp.clip(u, 0.0, float(n_grid - 1))
    s_s, s_t = score_math.table_interp_delta(
        (tabs_ref[0], tabs_ref[1]), u, n_grid)

    lcorr = float(np.log2(corr))
    lc10 = float(np.log2(c10))
    for c, (T_ref, R_ref, s_log, q) in enumerate(
            ((Ts_ref, Rs_ref, s_s, q_s), (Tt_ref, Rt_ref, s_t, q_t))):
        D_b = score_math.d_beta_log2(T_ref[0], R_ref[0], s_log + lcorr,
                                     p, q, lc10, beta)
        out_ref[f, rt, c] = jnp.sum(D_b)


@functools.partial(jax.jit, static_argnames=(
    "y0", "dy", "Ymin", "Ymax", "p", "q", "c10", "corr", "beta", "interpret"))
def _band_score_call(T, R, L, table, y0, dy, Ymin, Ymax, p, q, c10, corr, beta,
                     interpret=False):
    F, h, w = T.shape
    TR = min(_TR, max(8, h))
    n_tiles = ceildiv(h, TR)
    hp = n_tiles * TR
    wp = ceildiv(w, 128) * 128
    if hp != h or wp != w:
        # pad with T == R (D = 0 there, so padded pixels contribute nothing)
        pad = ((0, 0), (0, hp - h), (0, wp - w))
        T = jnp.pad(T, pad)
        R = jnp.pad(R, pad)
        L = jnp.pad(L, pad, constant_values=1.0)

    partials = pl.pallas_call(
        functools.partial(_band_score_kernel, y0=y0, dy=dy, Ymin=Ymin,
                          Ymax=Ymax, p=p, q=q, c10=c10, corr=corr, beta=beta,
                          n_grid=table.shape[0]),
        grid=(F, n_tiles),
        in_specs=[
            pl.BlockSpec((1, table.shape[0]), lambda f, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TR, wp), lambda f, t: (f, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TR, wp), lambda f, t: (f, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TR, wp), lambda f, t: (f, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((F, n_tiles), lambda f, t: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((F, n_tiles), T.dtype),
        interpret=interpret,
    )(table[None, :], T, R, L)
    return jnp.sum(partials, axis=1)  # (F,) sums of D^beta


@functools.partial(jax.jit, static_argnames=(
    "y0", "dy", "Ymin", "Ymax", "p", "q_s", "q_t", "c10", "corr", "beta",
    "interpret"))
def _band_score2_call(Ts, Rs, Tt, Rt, L, tables, y0, dy, Ymin, Ymax, p, q_s,
                      q_t, c10, corr, beta, interpret=False):
    F, h, w = Ts.shape
    TR = min(_TR, max(8, h))
    n_tiles = ceildiv(h, TR)
    hp = n_tiles * TR
    wp = ceildiv(w, 128) * 128
    if hp != h or wp != w:
        pad = ((0, 0), (0, hp - h), (0, wp - w))
        Ts, Rs = jnp.pad(Ts, pad), jnp.pad(Rs, pad)
        Tt, Rt = jnp.pad(Tt, pad), jnp.pad(Rt, pad)
        L = jnp.pad(L, pad, constant_values=1.0)

    n_grid = tables.shape[1]
    band_spec = pl.BlockSpec((1, TR, wp), lambda f, t: (f, t, 0),
                             memory_space=pltpu.VMEM)
    partials = pl.pallas_call(
        functools.partial(_band_score2_kernel, y0=y0, dy=dy, Ymin=Ymin,
                          Ymax=Ymax, p=p, q_s=q_s, q_t=q_t, c10=c10,
                          corr=corr, beta=beta, n_grid=n_grid),
        grid=(F, n_tiles),
        in_specs=[pl.BlockSpec((2, n_grid), lambda f, t: (0, 0),
                               memory_space=pltpu.VMEM)] + [band_spec] * 5,
        out_specs=pl.BlockSpec((F, n_tiles, 2), lambda f, t: (0, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((F, n_tiles, 2), Ts.dtype),
        interpret=interpret,
    )(tables, Ts, Rs, Tt, Rt, L)
    return jnp.sum(partials, axis=1)  # (F, 2) sums of D^beta


def _band_score2_jnp(Ts, Rs, Tt, Rt, L, tables, meta2):
    y0, dy, Ymin, Ymax, p, q_s, q_t, c10, corr, beta = meta2
    out_s = _band_score_jnp(Ts, Rs, L, tables[0],
                            (y0, dy, Ymin, Ymax, p, q_s, c10, corr, beta))
    out_t = _band_score_jnp(Tt, Rt, L, tables[1],
                            (y0, dy, Ymin, Ymax, p, q_t, c10, corr, beta))
    return jnp.stack([out_s, out_t], axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _band_score2(Ts, Rs, Tt, Rt, L, tables, meta2):
    from fovvideovdp_tpu.ops import pallas as pallas_cfg
    y0, dy, Ymin, Ymax, p, q_s, q_t, c10, corr, beta = meta2
    return _band_score2_call(Ts, Rs, Tt, Rt, L, tables, y0=y0, dy=dy,
                             Ymin=Ymin, Ymax=Ymax, p=p, q_s=q_s, q_t=q_t,
                             c10=c10, corr=corr, beta=beta,
                             interpret=pallas_cfg.interpret_mode())


def _bs2_fwd(Ts, Rs, Tt, Rt, L, tables, meta2):
    return _band_score2(Ts, Rs, Tt, Rt, L, tables, meta2), \
        (Ts, Rs, Tt, Rt, L, tables)


def _bs2_bwd(meta2, res, g):
    Ts, Rs, Tt, Rt, L, tables = res
    _, vjp = jax.vjp(
        lambda a, b, c, d, e, t: _band_score2_jnp(a, b, c, d, e, t, meta2),
        Ts, Rs, Tt, Rt, L, tables)
    return vjp(g)


_band_score2.defvjp(_bs2_fwd, _bs2_bwd)


def band_score2_pallas(band, L_bkg, tables, lut, p, q_sust, q_trans, mask_c,
                       sens_corr, beta):
    """Fused scoring of BOTH temporal channels of one band.

    band: (F, 4, h, w) contrast stack [T-sust, R-sust, T-trans, R-trans];
    tables: (2, n) pre-reduced S_log(Y_log) tables (sustained, transient —
    both LUTs must share the Y grid; the shipped calibration pair does).
    Returns (F, 2) per-frame sums of D^beta."""
    Y_log = np.asarray(lut["Y_log"])
    Y = np.asarray(lut["Y"])
    meta2 = (float(Y_log[0]),
             float((Y_log[-1] - Y_log[0]) / (Y_log.shape[0] - 1)),
             float(Y[0]), float(Y[-1]),
             float(p), float(q_sust), float(q_trans),
             float(10.0 ** mask_c), float(sens_corr), float(beta))
    return _band_score2(band[:, 0], band[:, 1], band[:, 2], band[:, 3],
                        L_bkg, jnp.asarray(tables), meta2)


# ---------------------------------------------------------------------------
# foveated fixed-gaze variant: PER-PIXEL S_log(Y_log) tables (plane-major)
# ---------------------------------------------------------------------------

def _band_score2_fov_kernel(tabs_s_ref, tabs_t_ref, Ts_ref, Rs_ref, Tt_ref,
                            Rt_ref, L_ref, out_ref, *, y0, dy, Ymin, Ymax, p,
                            q_s, q_t, c10, corr, beta, n_grid):
    """Both temporal channels of one (row, column) tile with per-pixel CSF
    tables.  The grid iterates frames INNERMOST with the table blocks
    indexed by the tile only, so Pallas re-DMAs the (heavy) tables once per
    tile and reuses them across the whole frame block."""
    f = pl.program_id(2)
    L = L_ref[0]
    u = (jnp.log2(jnp.clip(L, Ymin, Ymax)) - y0) / dy
    u = jnp.clip(u, 0.0, float(n_grid - 1))
    # table_interp_delta indexes rows by knot; a plane-major ref block
    # (n, TR, CB) yields a (TR, CB) plane per knot, so the same telescoped
    # accumulation interpolates per pixel.
    s_s, s_t = score_math.table_interp_delta(
        (tabs_s_ref, tabs_t_ref), u, n_grid)

    lcorr = float(np.log2(corr))
    lc10 = float(np.log2(c10))
    for c, (T_ref, R_ref, s_log, q) in enumerate(
            ((Ts_ref, Rs_ref, s_s, q_s), (Tt_ref, Rt_ref, s_t, q_t))):
        D_b = score_math.d_beta_log2(T_ref[0], R_ref[0], s_log + lcorr,
                                     p, q, lc10, beta)
        out_ref[0, 0, f, c] = jnp.sum(D_b)


def _fov_tile_shape(h: int, w: int):
    """(TR, CB) so two double-buffered (n, TR, CB) table blocks fit VMEM
    (~8 MB budget), preferring the column block that pads least."""
    best = None
    for cb in (512, 384, 256, 128):
        wp = ceildiv(w, cb) * cb
        if best is None or wp < best[1]:
            best = (cb, wp)
    CB, _ = best
    TR = min(32, max(8, 16384 // CB))
    return TR, CB


@functools.partial(jax.jit, static_argnames=(
    "y0", "dy", "Ymin", "Ymax", "p", "q_s", "q_t", "c10", "corr", "beta",
    "interpret"))
def _band_score2_fov_call(Ts, Rs, Tt, Rt, L, tabs_s, tabs_t, y0, dy, Ymin,
                          Ymax, p, q_s, q_t, c10, corr, beta, interpret=False):
    F, h, w = Ts.shape
    n_grid = tabs_s.shape[0]
    TR, CB = _fov_tile_shape(h, w)
    n_rt = ceildiv(h, TR)
    n_ct = ceildiv(w, CB)
    hp, wp = n_rt * TR, n_ct * CB
    if hp != h or wp != w:
        pad = ((0, 0), (0, hp - h), (0, wp - w))
        # padded pixels hold T == R == 0 -> D = 0 exactly, any table value
        Ts, Rs = jnp.pad(Ts, pad), jnp.pad(Rs, pad)
        Tt, Rt = jnp.pad(Tt, pad), jnp.pad(Rt, pad)
        L = jnp.pad(L, pad, constant_values=1.0)
        tpad = ((0, 0), (0, hp - h), (0, wp - w))
        tabs_s = jnp.pad(tabs_s, tpad)
        tabs_t = jnp.pad(tabs_t, tpad)

    tab_spec = pl.BlockSpec((n_grid, TR, CB), lambda ct, rt, f: (0, rt, ct),
                            memory_space=pltpu.VMEM)
    band_spec = pl.BlockSpec((1, TR, CB), lambda ct, rt, f: (f, rt, ct),
                             memory_space=pltpu.VMEM)
    partials = pl.pallas_call(
        functools.partial(_band_score2_fov_kernel, y0=y0, dy=dy, Ymin=Ymin,
                          Ymax=Ymax, p=p, q_s=q_s, q_t=q_t, c10=c10,
                          corr=corr, beta=beta, n_grid=n_grid),
        grid=(n_ct, n_rt, F),
        in_specs=[tab_spec, tab_spec] + [band_spec] * 5,
        # the (F, 2) tail of the block spans the full array (Mosaic's
        # block-mapping rule: last two dims divisible by (8, 128) or equal
        # to the array's) — frames are the innermost grid dim, so the block
        # stays resident and each f-step fills its own row
        out_specs=pl.BlockSpec((1, 1, F, 2), lambda ct, rt, f: (ct, rt, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((n_ct, n_rt, F, 2), Ts.dtype),
        interpret=interpret,
    )(tabs_s, tabs_t, Ts, Rs, Tt, Rt, L)
    return jnp.sum(partials, axis=(0, 1))  # (F, 2) sums of D^beta


def _band_score2_fov_jnp(Ts, Rs, Tt, Rt, L, tabs_s, tabs_t, meta2):
    """jnp composition with identical math (fallback + gradient rule)."""
    y0, dy, Ymin, Ymax, p, q_s, q_t, c10, corr, beta = meta2
    n = tabs_s.shape[0]
    u = jnp.clip((jnp.log2(jnp.clip(L, Ymin, Ymax)) - y0) / dy, 0.0,
                 float(n - 1))

    def s_of(tabs):
        s = jnp.zeros_like(u) + tabs[0]
        for i in range(n - 1):
            s = s + (tabs[i + 1] - tabs[i]) * jnp.clip(u - float(i), 0.0, 1.0)
        return jnp.exp2(s) * corr

    outs = []
    for T, R, tabs, q in ((Ts, Rs, tabs_s, q_s), (Tt, Rt, tabs_t, q_t)):
        Se = s_of(tabs)
        Tn, Rn = T * Se, R * Se
        M = c10 * jnp.minimum(jnp.abs(Tn), jnp.abs(Rn))
        D = jnp.minimum(jnp.power(jnp.abs(Tn - Rn), p)
                        / (1.0 + jnp.power(M, q)), 1e4)
        outs.append(jnp.sum(jnp.power(D, beta), axis=(-2, -1)))
    return jnp.stack(outs, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _band_score2_fov(Ts, Rs, Tt, Rt, L, tabs_s, tabs_t, meta2):
    from fovvideovdp_tpu.ops import pallas as pallas_cfg
    y0, dy, Ymin, Ymax, p, q_s, q_t, c10, corr, beta = meta2
    return _band_score2_fov_call(Ts, Rs, Tt, Rt, L, tabs_s, tabs_t, y0=y0,
                                 dy=dy, Ymin=Ymin, Ymax=Ymax, p=p, q_s=q_s,
                                 q_t=q_t, c10=c10, corr=corr, beta=beta,
                                 interpret=pallas_cfg.interpret_mode())


def _bs2f_fwd(Ts, Rs, Tt, Rt, L, tabs_s, tabs_t, meta2):
    return _band_score2_fov(Ts, Rs, Tt, Rt, L, tabs_s, tabs_t, meta2), \
        (Ts, Rs, Tt, Rt, L, tabs_s, tabs_t)


def _bs2f_bwd(meta2, res, g):
    Ts, Rs, Tt, Rt, L, tabs_s, tabs_t = res
    _, vjp = jax.vjp(
        lambda a, b, c, d, e, s, t: _band_score2_fov_jnp(a, b, c, d, e, s, t,
                                                         meta2),
        Ts, Rs, Tt, Rt, L, tabs_s, tabs_t)
    return vjp(g)


_band_score2_fov.defvjp(_bs2f_fwd, _bs2f_bwd)


def band_score2_fov_pallas(band, L_bkg, tabs_s, tabs_t, lut, p, q_sust,
                           q_trans, mask_c, sens_corr, beta):
    """Fused scoring of BOTH temporal channels with PER-PIXEL CSF tables
    (the fixed-gaze foveated path).

    band: (F, 4, h, w) contrast stack; tabs_s/tabs_t: (n, h, w) plane-major
    S_log(Y_log) tables (core.fov_tables output; both LUTs must share the Y
    grid).  Returns (F, 2) per-frame sums of D^beta."""
    Y_log = np.asarray(lut["Y_log"])
    Y = np.asarray(lut["Y"])
    meta2 = (float(Y_log[0]),
             float((Y_log[-1] - Y_log[0]) / (Y_log.shape[0] - 1)),
             float(Y[0]), float(Y[-1]),
             float(p), float(q_sust), float(q_trans),
             float(10.0 ** mask_c), float(sens_corr), float(beta))
    return _band_score2_fov(band[:, 0], band[:, 1], band[:, 2], band[:, 3],
                            L_bkg, jnp.asarray(tabs_s), jnp.asarray(tabs_t),
                            meta2)


def _band_score_jnp(T, R, L, table, meta):
    """jnp composition with identical math (fallback + gradient rule)."""
    y0, dy, Ymin, Ymax, p, q, c10, corr, beta = meta
    n = table.shape[0]
    u = jnp.clip((jnp.log2(jnp.clip(L, Ymin, Ymax)) - y0) / dy, 0.0,
                 float(n - 1))
    i0 = jnp.floor(u).astype(jnp.int32)
    f = u - i0
    i1 = jnp.minimum(i0 + 1, n - 1)
    oh = (jax.nn.one_hot(i0, n, dtype=L.dtype) * (1.0 - f)[..., None]
          + jax.nn.one_hot(i1, n, dtype=L.dtype) * f[..., None])
    Se = jnp.exp2(oh @ table) * corr
    Tn = T * Se
    Rn = R * Se
    M = c10 * jnp.minimum(jnp.abs(Tn), jnp.abs(Rn))
    D = jnp.minimum(jnp.power(jnp.abs(Tn - Rn), p) / (1.0 + jnp.power(M, q)),
                    1e4)
    return jnp.sum(jnp.power(D, beta), axis=(-2, -1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _band_score(T, R, L, table, meta):
    from fovvideovdp_tpu.ops import pallas as pallas_cfg
    y0, dy, Ymin, Ymax, p, q, c10, corr, beta = meta
    return _band_score_call(T, R, L, table, y0=y0, dy=dy, Ymin=Ymin,
                            Ymax=Ymax, p=p, q=q, c10=c10, corr=corr,
                            beta=beta, interpret=pallas_cfg.interpret_mode())


def _bs_fwd(T, R, L, table, meta):
    return _band_score(T, R, L, table, meta), (T, R, L, table)


def _bs_bwd(meta, res, g):
    T, R, L, table = res
    _, vjp = jax.vjp(lambda a, b, c, t: _band_score_jnp(a, b, c, t, meta),
                     T, R, L, table)
    return vjp(g)


_band_score.defvjp(_bs_fwd, _bs_bwd)


def band_score_pallas(T, R, L_bkg, table_1d, lut, p, q, mask_c, sens_corr,
                      beta):
    """Fused band scoring: returns per-frame sum over pixels of D^beta.

    Matches csf.sensitivity_1d + ops.masking.apply_masking_model + the
    beta-power sum in core.score_frames; differentiable via the jnp rule."""
    Y_log = np.asarray(lut["Y_log"])
    Y = np.asarray(lut["Y"])
    meta = (float(Y_log[0]),
            float((Y_log[-1] - Y_log[0]) / (Y_log.shape[0] - 1)),
            float(Y[0]), float(Y[-1]),
            float(p), float(q), float(10.0 ** mask_c), float(sens_corr),
            float(beta))
    return _band_score(T, R, L_bkg, jnp.asarray(table_1d), meta)
