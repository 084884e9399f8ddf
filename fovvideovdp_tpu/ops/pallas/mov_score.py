"""Fused moving-gaze foveated band scorer: the trilinear CSF IN the kernel.

The moving-gaze path must evaluate a different per-pixel CSF for every
frame (the gaze, and with it every pixel's eccentricity, moves).  The
previous fast path materialised per-frame per-pixel S_log(Y_log) tables in
HBM (an MXU collapse of the windowed LUT, core._mov_tables_for_frame) and
fed them to the fixed-gaze kernel under a scan — ~n_grid floats of HBM
write+read per pixel per frame, which made moving-gaze video ~3.5x slower
than fixed-gaze.  This kernel removes ALL of that traffic: each tile
computes its eccentricity from the static view-direction planes and the
frame's gaze scalar, then performs the full trilinear LUT interpolation in
VMEM.  Per-frame HBM traffic is the band tiles themselves — identical to
the fixed-gaze kernel — plus three static (h, w) planes read once per tile
per block.

All three interpolation axes run over DYNAMIC per-tile knot windows (the
same trick as score_math.table_interp_delta_dyn): eccentricity varies
smoothly across a tile, a band's spatial frequencies span a couple of rho
knots, and background luminance is locally narrow — a tile typically
touches 2 x 2 x (2-6) knots of the (n_e, ny, nr) windowed LUT, which lives
in SMEM for the dynamically indexed scalar loads.

Semantics: identical to the reference trilinear CSF lookup
(pyfvvdp/fvvdp.py:414-420, interp3 separable weights — here hat weights on
the uniform sqrt-ecc / log2-rho axes and the telescoped-delta form along
log2-luminance), restricted to the band's reachable rho window and the
display's weightable Y window, both exact-by-zero-weight restrictions.
Gated by core.score_frames's ``mov_fused`` (uniform axes, shared Y grid,
no content mapping).
"""
from __future__ import annotations

import functools
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fovvideovdp_tpu.ops.pallas import score_math
from fovvideovdp_tpu.ops.pyramid import ceildiv


def supports(h: int, w: int) -> bool:
    return w >= 128 and h >= 8


def _mov_kernel(V2s_ref, V2t_ref, V2sd_ref, V2td_ref, gaze_ref, vd0_ref,
                vd1_ref, tr_ref, Ts_ref, Rs_ref, Tt_ref, Rt_ref, L_ref,
                out_ref, rwin_ref, *,
                y0, dy, Ymin, Ymax, es0, des, emin, emax, n_e, ny, nr,
                off5, p, q_s, q_t, c10, corr, beta):
    """One (row, column) tile of one frame: ecc from the gaze, trilinear
    CSF over dynamic knot windows, masking, beta-norm partials."""
    f = pl.program_id(2)
    g0 = gaze_ref[f, 0]
    g1 = gaze_ref[f, 1]
    dx = vd0_ref[...] - g0
    dv = vd1_ref[...] - g1
    ecc = jnp.sqrt(dx * dx + dv * dv)
    te = (jnp.sqrt(jnp.clip(ecc, emin, emax)) - es0) / des
    te = jnp.clip(te, 0.0, float(n_e - 1))
    tr = tr_ref[...]
    L = L_ref[0]
    u = (jnp.log2(jnp.clip(L, Ymin, Ymax)) - y0) / dy
    u = jnp.clip(u, 0.0, float(ny - 1))

    # Window bounds only — sanitize non-finite lanes (NaN luminance / gaze in
    # user input) so a single bad value cannot yield an implementation-defined
    # int window that corrupts the whole tile; the offending lanes themselves
    # still carry NaN through the hat/clip weights below.
    tef = jnp.where(jnp.isfinite(te), te, 0.0)
    uf = jnp.where(jnp.isfinite(u), u, 0.0)
    e0 = jnp.clip(jnp.floor(jnp.min(tef)).astype(jnp.int32), 0, n_e - 1)
    e1 = jnp.clip(jnp.ceil(jnp.max(tef)).astype(jnp.int32), 0, n_e - 1)

    # the rho coordinate plane is static: its window survives the whole
    # frame block, so the two tile reductions run once per tile (f == 0,
    # the innermost grid axis) and land in SMEM scratch for the rest
    @pl.when(f == 0)
    def _():
        rwin_ref[0] = jnp.clip(jnp.floor(jnp.min(tr)).astype(jnp.int32),
                               0, nr - 1)
        rwin_ref[1] = jnp.clip(jnp.ceil(jnp.max(tr)).astype(jnp.int32),
                               0, nr - 1)
    r0 = rwin_ref[0]
    r1 = rwin_ref[1]
    yl = jnp.clip(jnp.floor(jnp.min(uf)).astype(jnp.int32), 0, ny - 1)
    yh = jnp.clip(jnp.ceil(jnp.max(uf)).astype(jnp.int32), 0, ny - 1)

    two = off5 is None
    zero = jnp.zeros_like(u)

    def e_body(ie, accs):
        e = e0 + ie
        w_e = jnp.clip(1.0 - jnp.abs(te - e.astype(jnp.float32)), 0.0, 1.0)

        def r_body(ir, accs):
            r = r0 + ir
            w = w_e * jnp.clip(1.0 - jnp.abs(tr - r.astype(jnp.float32)),
                               0.0, 1.0)
            # luminance axis in telescoped-delta form over its window:
            # knots below contribute their full delta, folded into the base
            # term read directly from the table (cf. table_interp_delta_dyn)
            col = yl * nr + r
            # u * 0 (not zero) keeps non-finite luminance lanes NaN even
            # when the sanitized Y window collapses to zero trips
            init = (u * 0.0 + V2s_ref[e, col],)
            if two:
                init = init + (u * 0.0 + V2t_ref[e, col],)

            def y_body(j, ss):
                # 2x unrolled: knot pairs halve the loop-carried scalar-load
                # serialization; the possible overhang knot (odd trip count,
                # y == yh) is EXACT via the telescoped form — its weight
                # clip(u - yh, 0, 1) is 0 for every finite lane, and the
                # delta table carries a padded zero row so the load at row
                # yh stays in bounds (see _ydelta)
                y = yl + 2 * j
                cA = jnp.clip(u - y.astype(jnp.float32), 0.0, 1.0)
                cB = jnp.clip(u - (y + 1).astype(jnp.float32), 0.0, 1.0)
                # pre-differenced delta table: ONE SMEM load per knot per
                # channel in the hot loop instead of two
                c0 = y * nr + r
                out = (ss[0] + V2sd_ref[e, c0] * cA
                       + V2sd_ref[e, c0 + nr] * cB,)
                if two:
                    out = out + (ss[1] + V2td_ref[e, c0] * cA
                                 + V2td_ref[e, c0 + nr] * cB,)
                return out

            vals = jax.lax.fori_loop(0, (yh - yl + 1) // 2, y_body, init)
            out = (accs[0] + w * vals[0],)
            if two:
                out = out + (accs[1] + w * vals[1],)
            return out

        return jax.lax.fori_loop(0, r1 - r0 + 1, r_body, accs)

    init = (zero, zero) if two else (zero,)
    accs = jax.lax.fori_loop(0, e1 - e0 + 1, e_body, init)
    s_s = accs[0]
    s_t = accs[1] if two else s_s + off5

    lcorr = float(np.log2(corr))
    lc10 = float(np.log2(c10))
    for c, (T_ref, R_ref, s_log, q) in enumerate(
            ((Ts_ref, Rs_ref, s_s, q_s), (Tt_ref, Rt_ref, s_t, q_t))):
        D_b = score_math.d_beta_log2(T_ref[0], R_ref[0], s_log + lcorr,
                                     p, q, lc10, beta)
        out_ref[0, 0, f, c] = jnp.sum(D_b)


def _mov_tile_shape(h: int, w: int):
    """(TR, CB): NARROW, TALL tiles.  The knot-window loops run over
    [floor(min), ceil(max)] of each coordinate per tile, and tile WIDTH is
    what widens the eccentricity window (a 512-px-wide tile spans tens of
    visual degrees; rows are cheap — the window adds in quadrature), so
    CB = 128 (the lane width) minimises trip counts; height then amortises
    the per-tile scalar window setup.  Hardware scan (2026-08-20, v5e,
    1440x1600 vive levels 0-2, moving-ms / moving-vs-fixed ratio):
    old CB512,TR32 184/1.60x; CB128: TR8 254, TR16 185, TR32 144/1.33x,
    **TR64 138/1.22x**, TR96 140/1.21x; TR=48/128 compile 10x slower
    (non-power-of-2 / register pressure).  FVVDP_MOV_TR / FVVDP_MOV_CB
    override for perf experiments (multiples of 8 / 128).  The env vars are
    read at TRACE time: set them before the first moving-gaze call in a
    process — once a shape has compiled, later changes are ignored (the jit
    cache keys on shapes/meta, not the environment).  Malformed values are
    ignored with a warning."""
    CB = 128
    TR = 64 if h >= 64 else max(8, ceildiv(h, 8) * 8)
    for name, quantum, floor in (("FVVDP_MOV_TR", 8, 8),
                                 ("FVVDP_MOV_CB", 128, 128)):
        env = os.environ.get(name)
        if env:
            try:
                val = max(floor, (int(env) // quantum) * quantum)
            except ValueError:
                logging.warning(f"ignoring malformed {name}={env!r} "
                                f"(expected an integer)")
                continue
            if name == "FVVDP_MOV_TR":
                TR = val
            else:
                CB = val
    return TR, CB


@functools.partial(jax.jit, static_argnames=(
    "meta", "interpret"))
def _mov_call(Ts, Rs, Tt, Rt, L, t_r, vd0, vd1, gaze, V2s, V2t, meta,
              interpret=False):
    (y0, dy, Ymin, Ymax, es0, des, emin, emax, off5, p, q_s, q_t, c10,
     corr, beta, ny, nr) = meta
    F, h, w = Ts.shape
    n_e = V2s.shape[0]
    TR, CB = _mov_tile_shape(h, w)
    n_rt = ceildiv(h, TR)
    n_ct = ceildiv(w, CB)
    hp, wp = n_rt * TR, n_ct * CB
    if hp != h or wp != w:
        pad = ((0, 0), (0, hp - h), (0, wp - w))
        # padded pixels hold T == R == 0 -> D = 0 exactly, any CSF value;
        # the static planes edge-pad so fringe tiles keep TIGHT knot
        # windows (zero-padding would drag every fringe window to knot 0)
        Ts, Rs = jnp.pad(Ts, pad), jnp.pad(Rs, pad)
        Tt, Rt = jnp.pad(Tt, pad), jnp.pad(Rt, pad)
        L = jnp.pad(L, pad, constant_values=1.0)
        pad2 = ((0, hp - h), (0, wp - w))
        t_r = jnp.pad(t_r, pad2, mode="edge")
        vd0 = jnp.pad(vd0, pad2, mode="edge")
        vd1 = jnp.pad(vd1, pad2, mode="edge")

    # pre-differenced luminance-axis delta tables: the kernel's hot y-loop
    # loads one delta per knot per channel instead of two adjacent S values.
    # One zero row is appended so the 2x-unrolled loop's overhang knot
    # (row index up to yh <= ny-1, weight exactly 0) stays in bounds.
    def _ydelta(V2):
        S = V2.reshape(n_e, ny, nr)
        if ny > 1:
            d = jnp.concatenate(
                [S[:, 1:] - S[:, :-1], jnp.zeros((n_e, 1, nr), V2.dtype)],
                axis=1)
            return d.reshape(n_e, ny * nr)
        return jnp.zeros((n_e, nr), V2.dtype)  # zero-trip loop; keep SMEM legal
    V2sd, V2td = _ydelta(V2s), _ydelta(V2t)

    smem_full = lambda shape: pl.BlockSpec(
        shape, lambda ct, rt, f: tuple(0 for _ in shape),
        memory_space=pltpu.SMEM)
    plane_spec = pl.BlockSpec((TR, CB), lambda ct, rt, f: (rt, ct),
                              memory_space=pltpu.VMEM)
    band_spec = pl.BlockSpec((1, TR, CB), lambda ct, rt, f: (f, rt, ct),
                             memory_space=pltpu.VMEM)
    partials = pl.pallas_call(
        functools.partial(_mov_kernel, y0=y0, dy=dy, Ymin=Ymin, Ymax=Ymax,
                          es0=es0, des=des, emin=emin, emax=emax, n_e=n_e,
                          ny=ny, nr=nr, off5=off5, p=p, q_s=q_s, q_t=q_t,
                          c10=c10, corr=corr, beta=beta),
        grid=(n_ct, n_rt, F),
        in_specs=[smem_full((n_e, ny * nr)), smem_full((n_e, ny * nr)),
                  smem_full(tuple(V2sd.shape)), smem_full(tuple(V2td.shape)),
                  smem_full((F, 2)), plane_spec, plane_spec, plane_spec]
        + [band_spec] * 5,
        # frames innermost; the (F, 2) tail spans the full array so the
        # block stays resident and each f-step fills its own row (Mosaic's
        # block-mapping rule, cf. band_score._band_score2_fov_call)
        out_specs=pl.BlockSpec((1, 1, F, 2), lambda ct, rt, f: (ct, rt, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((n_ct, n_rt, F, 2), Ts.dtype),
        scratch_shapes=[pltpu.SMEM((2,), jnp.int32)],
        interpret=interpret,
    )(V2s, V2t, V2sd, V2td, gaze, vd0, vd1, t_r, Ts, Rs, Tt, Rt, L)
    return jnp.sum(partials, axis=(0, 1))  # (F, 2) sums of D^beta


def _mov_jnp(Ts, Rs, Tt, Rt, L, t_r, vd0, vd1, gaze, V2s, V2t, meta):
    """jnp composition: 8-corner trilinear gather (fallback + gradient
    rule).  Same interpolant as the kernel's window loops — identical up to
    float association order."""
    (y0, dy, Ymin, Ymax, es0, des, emin, emax, off5, p, q_s, q_t, c10,
     corr, beta, ny, nr) = meta
    n_e = V2s.shape[0]
    dx = vd0[None] - gaze[:, 0, None, None]
    dv = vd1[None] - gaze[:, 1, None, None]

    def safe_sqrt(x):
        # gradient-safe: sqrt'(0) = inf would NaN the gaze gradient when
        # the gaze lands exactly on a pixel; forward values are unchanged
        pos = x > 0
        return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)

    ecc = safe_sqrt(dx * dx + dv * dv)
    te = jnp.clip((safe_sqrt(jnp.clip(ecc, emin, emax)) - es0) / des,
                  0.0, float(n_e - 1))
    tr = jnp.broadcast_to(t_r[None], te.shape)
    u = jnp.clip((jnp.log2(jnp.clip(L, Ymin, Ymax)) - y0) / dy,
                 0.0, float(ny - 1))

    def corners(t, n):
        i0 = jnp.floor(t).astype(jnp.int32)
        fr = t - i0
        i1 = jnp.minimum(i0 + 1, n - 1)
        return i0, i1, fr

    ie0, ie1, fe = corners(te, n_e)
    ir0, ir1, fr = corners(tr, nr)
    iy0, iy1, fy = corners(u, ny)

    def interp(V2):
        flat = V2.reshape(-1)

        def take(ie, iy, ir):
            return jnp.take(flat, (ie * ny + iy) * nr + ir)

        s = jnp.zeros_like(u)
        for ie, we in ((ie0, 1.0 - fe), (ie1, fe)):
            for iy, wy in ((iy0, 1.0 - fy), (iy1, fy)):
                for ir, wr in ((ir0, 1.0 - fr), (ir1, fr)):
                    s = s + we * wy * wr * take(ie, iy, ir)
        return s

    s_s = interp(V2s)
    s_t = s_s + off5 if off5 is not None else interp(V2t)

    outs = []
    for T, R, s_log, q in ((Ts, Rs, s_s, q_s), (Tt, Rt, s_t, q_t)):
        Se = jnp.exp2(s_log) * corr
        Tn, Rn = T * Se, R * Se
        M = c10 * jnp.minimum(jnp.abs(Tn), jnp.abs(Rn))
        D = jnp.minimum(jnp.power(jnp.abs(Tn - Rn), p)
                        / (1.0 + jnp.power(M, q)), 1e4)
        outs.append(jnp.sum(jnp.power(D, beta), axis=(-2, -1)))
    return jnp.stack(outs, axis=-1)  # (F, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11,))
def _mov_score(Ts, Rs, Tt, Rt, L, t_r, vd0, vd1, gaze, V2s, V2t, meta):
    from fovvideovdp_tpu.ops import pallas as pallas_cfg
    return _mov_call(Ts, Rs, Tt, Rt, L, t_r, vd0, vd1, gaze, V2s, V2t,
                     meta, interpret=pallas_cfg.interpret_mode())


def _mov_fwd(Ts, Rs, Tt, Rt, L, t_r, vd0, vd1, gaze, V2s, V2t, meta):
    return _mov_score(Ts, Rs, Tt, Rt, L, t_r, vd0, vd1, gaze, V2s, V2t,
                      meta), (Ts, Rs, Tt, Rt, L, t_r, vd0, vd1, gaze, V2s,
                              V2t)


def _mov_bwd(meta, res, g):
    _, vjp = jax.vjp(lambda *a: _mov_jnp(*a, meta), *res)
    return vjp(g)


_mov_score.defvjp(_mov_fwd, _mov_bwd)


def _mov_meta(mov_data, ecc_lut, y_lut, p, q_sust, q_trans, mask_c,
              sens_corr, beta):
    Y_log = np.asarray(y_lut["Y_log"])
    Y = np.asarray(y_lut["Y"])
    es = np.asarray(ecc_lut["ecc_sqrt"])
    ec = np.asarray(ecc_lut["ecc"])
    off5 = mov_data["off5"]
    return (float(Y_log[0]),
            float((Y_log[-1] - Y_log[0]) / (Y_log.shape[0] - 1)),
            float(Y[0]), float(Y[-1]),
            float(es[0]), float((es[-1] - es[0]) / (es.shape[0] - 1)),
            float(ec[0]), float(ec[-1]),
            None if off5 is None else float(off5),
            float(p), float(q_sust), float(q_trans),
            float(10.0 ** mask_c), float(sens_corr), float(beta),
            int(mov_data["ny"]), int(mov_data["nr"]))


def band_score2_mov_jnp(band, L_bkg, mov_data, vd, gaze_dir, ecc_lut,
                        y_lut, p, q_sust, q_trans, mask_c, sens_corr,
                        beta):
    """The kernel's jnp composition with the public signature (correctness
    oracle for tests; the kernel path's gradients recompute through it)."""
    meta = _mov_meta(mov_data, ecc_lut, y_lut, p, q_sust, q_trans, mask_c,
                     sens_corr, beta)
    V2s = mov_data["V2"]
    V2t = V2s if mov_data["off5"] is not None else mov_data["V2_5"]
    return _mov_jnp(band[:, 0], band[:, 1], band[:, 2], band[:, 3],
                    L_bkg, mov_data["t_r"], vd[0], vd[1],
                    jnp.asarray(gaze_dir), V2s, V2t, meta)


def band_score2_mov_pallas(band, L_bkg, mov_data, vd, gaze_dir, ecc_lut,
                           y_lut, p, q_sust, q_trans, mask_c, sens_corr,
                           beta):
    """Fused scoring of BOTH temporal channels of one band with a PER-FRAME
    gaze — the moving-gaze foveated path, one dispatch per band per block.

    band: (F, 4, h, w) contrast stack; L_bkg: (F, h, w); mov_data:
    core._moving_band_data output (windowed LUT "V2"/"V2_5"/"off5",
    per-pixel rho coordinate "t_r", window sizes "ny"/"nr"); vd: (2, h, w)
    static view directions (deg); gaze_dir: (F, 2) per-frame gaze view
    directions (deg); ecc_lut: LUT whose (uniform) sqrt-ecc axis collapses
    in-kernel; y_lut: trimmed LUT for the luminance-axis meta (both
    temporal channels must share it).  Returns (F, 2) per-frame sums of
    D^beta."""
    meta = _mov_meta(mov_data, ecc_lut, y_lut, p, q_sust, q_trans, mask_c,
                     sens_corr, beta)
    V2s = mov_data["V2"]
    V2t = V2s if mov_data["off5"] is not None else mov_data["V2_5"]
    return _mov_score(band[:, 0], band[:, 1], band[:, 2], band[:, 3],
                      L_bkg, mov_data["t_r"], vd[0], vd[1],
                      jnp.asarray(gaze_dir), V2s, V2t, meta)
