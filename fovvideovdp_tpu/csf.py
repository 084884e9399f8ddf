"""Contrast sensitivity function: 3-D LUT lookup + cache management.

The shipped LUTs are the published calibration data (32^3 grids over
log2-luminance x log2-frequency x sqrt-eccentricity, one per temporal
frequency omega in {0, 5} Hz) converted from the reference's csf_cache
(pyfvvdp/fvvdp.py:505-537).  Unlike the reference — which *cannot* build new
LUTs from Python (fvvdp.py:517-518 raises) — missing cache entries are
regenerated on the fly from the analytic model in
:mod:`fovvideovdp_tpu.csf_generator`.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fovvideovdp_tpu import utils
from fovvideovdp_tpu.ops.interp import interp3

# Contractions against the S_log tables must NOT run as single-pass bf16
# MXU matmuls (the TPU default): S_log magnitudes (~13) round to ~0.05
# absolute in bf16, a ~3.5% sensitivity error — beyond the metric's
# parity tolerance.  All lookup contractions request full-precision
# accumulation (a no-op on CPU).
_PREC = jax.lax.Precision.HIGHEST

_DATA_DIR = os.path.join(os.path.dirname(__file__), "data")

LUT_FIELDS = ("Y", "rho", "ecc", "Y_log", "rho_log", "ecc_sqrt", "S_log")


def cache_key(omega: float, sigma: float, k_cm: float) -> str:
    """Key naming scheme shared with the reference cache files
    (pyfvvdp/fvvdp.py:502-503)."""
    return ("o%g_s%g_cm%f" % (omega, sigma, k_cm)).replace("-", "n").replace(".", "_")


class CSFCache:
    """Loads and holds CSF sensitivity LUTs as device arrays.

    Search order for a LUT: packaged .npz -> user .mat caches in the
    reference's format (``csf_cache/<key>_gpu0.mat`` under cwd or a user
    directory) -> analytic regeneration.
    """

    def __init__(self, extra_dirs: Optional[list] = None):
        self._cache: Dict[str, Dict[str, jnp.ndarray]] = {}
        self.extra_dirs = extra_dirs or ["csf_cache"]

    def get(self, omega: float, sigma: float, k_cm: float) -> Dict[str, jnp.ndarray]:
        key = cache_key(omega, sigma, k_cm)
        if key in self._cache:
            return self._cache[key]

        lut_np = self._load_npz(key)
        if lut_np is None:
            lut_np = self._load_mat(key)
        if lut_np is None:
            lut_np = self._generate(omega, sigma, k_cm)

        lut = {k: jnp.asarray(v, dtype=jnp.float32) for k, v in lut_np.items()}
        # The fast interpolation paths use direct index arithmetic, valid only
        # on grids uniform in their transformed space; user-supplied .mat
        # caches may have arbitrary monotone grids and take a searchsorted-
        # equivalent path instead (ADVICE: silent mis-interpolation otherwise).
        lut["_uniform"] = {
            ax: _grid_is_uniform(np.asarray(lut_np[ax]))
            for ax in ("Y_log", "rho_log", "ecc_sqrt")}
        self._cache[key] = lut
        return lut

    def _load_npz(self, key: str):
        path = os.path.join(_DATA_DIR, f"csf_lut_{key}.npz")
        if not os.path.isfile(path):
            return None
        with np.load(path) as z:
            return {k: z[k] for k in LUT_FIELDS}

    def _load_mat(self, key: str):
        for d in self.extra_dirs:
            for suffix in ("_gpu0.mat", ".mat"):
                path = os.path.join(d, key + suffix)
                if os.path.isfile(path):
                    lut = utils.load_mat_dict(path, "lut")
                    if lut is not None:
                        return {k: np.asarray(lut[k], dtype=np.float32).squeeze()
                                if k != "S_log" else np.asarray(lut[k], dtype=np.float32)
                                for k in LUT_FIELDS}
        return None

    def _generate(self, omega: float, sigma: float, k_cm: float):
        from fovvideovdp_tpu import csf_generator
        return csf_generator.precompute_lut(omega, sigma, k_cm)


def _grid_is_uniform(grid: np.ndarray, rtol: float = 1e-4) -> bool:
    d = np.diff(np.asarray(grid, dtype=np.float64))
    return bool(d.size == 0 or np.allclose(d, d[0], rtol=rtol, atol=1e-7))


def lut_is_uniform(lut: Dict) -> bool:
    """True when every LUT axis is uniform in its transformed space (the
    shipped calibration LUTs are; user .mat caches may not be)."""
    flags = lut.get("_uniform")
    return flags is None or all(flags.values())


def _interpolants_np(x_q: float, x: np.ndarray):
    """Host-side scalar version of the reference cell search
    (pyfvvdp/interp.py:11-20) used to pre-reduce LUT axes at trace time."""
    n = x.shape[0]
    i_hi = int(np.searchsorted(x, x_q, side="left"))
    i_hi = min(i_hi, n - 1)
    i_lo = min(max(i_hi - 1, 0), n - 1)
    frac = (x_q - x[i_lo]) / (x[i_hi] - x[i_lo] + 1e-6)
    if i_hi == i_lo or frac < 0.0:
        frac = 0.0
    return i_lo, i_hi, float(frac)


def reduce_lut_to_1d(lut: Dict[str, jnp.ndarray], rho: float, ecc: float) -> np.ndarray:
    """Collapse the 3-D LUT to a 32-entry S_log(Y_log) table for fixed
    (rho, ecc) — exact two-axis slice of the trilinear interpolation.

    Used for the non-foveated fast path: per band the spatial frequency and
    eccentricity are compile-time constants, so the only per-pixel axis is
    background luminance."""
    rho_log = np.asarray(lut["rho_log"])
    ecc_sqrt = np.asarray(lut["ecc_sqrt"])
    S_log = np.asarray(lut["S_log"])  # [Y, rho, ecc]

    rho_q = np.log2(np.clip(rho, float(np.asarray(lut["rho"])[0]),
                            float(np.asarray(lut["rho"])[-1])))
    ecc_q = np.sqrt(np.clip(ecc, float(np.asarray(lut["ecc"])[0]),
                            float(np.asarray(lut["ecc"])[-1])))

    i_lo, i_hi, fi = _interpolants_np(rho_q, rho_log)
    k_lo, k_hi, fk = _interpolants_np(ecc_q, ecc_sqrt)

    t = ((S_log[:, i_lo, k_lo] * (1 - fi) + S_log[:, i_hi, k_lo] * fi) * (1 - fk)
         + (S_log[:, i_lo, k_hi] * (1 - fi) + S_log[:, i_hi, k_hi] * fi) * fk)
    return t.astype(np.float32)


def _uniform_weights(q, grid):
    """2-point interpolation weights on a uniform grid as a dense one-hot
    row (n,) per query — gather-free."""
    n = grid.shape[0]
    x0 = grid[0]
    dx = (grid[-1] - grid[0]) / (n - 1)
    u = jnp.clip((q - x0) / dx, 0.0, float(n - 1))
    i0 = jnp.floor(u).astype(jnp.int32)
    f = u - i0
    i1 = jnp.minimum(i0 + 1, n - 1)
    return (jax.nn.one_hot(i0, n, dtype=q.dtype) * (1.0 - f)[..., None]
            + jax.nn.one_hot(i1, n, dtype=q.dtype) * f[..., None])


def _monotone_weights(q, grid):
    """2-point interpolation weights on an arbitrary monotone grid, still
    gather-free: the cell search is a dense comparison count (searchsorted
    semantics of the reference interpolants, pyfvvdp/interp.py:11-20) and
    grid values are read back through one-hot contractions."""
    n = grid.shape[0]
    qf = q[..., None]
    i_hi = jnp.minimum(jnp.sum((grid < qf).astype(jnp.int32), axis=-1), n - 1)
    i_lo = jnp.clip(i_hi - 1, 0, n - 1)
    oh_lo = jax.nn.one_hot(i_lo, n, dtype=q.dtype)
    oh_hi = jax.nn.one_hot(i_hi, n, dtype=q.dtype)
    x_lo = jnp.matmul(oh_lo, grid, precision=_PREC)
    x_hi = jnp.matmul(oh_hi, grid, precision=_PREC)
    f = (q - x_lo) / (x_hi - x_lo + 1e-6)
    f = jnp.where((i_hi == i_lo) | (f < 0.0), 0.0, f)
    return oh_lo * (1.0 - f)[..., None] + oh_hi * f[..., None]


def _grid_weights(q, grid, uniform: bool):
    return _uniform_weights(q, grid) if uniform else _monotone_weights(q, grid)


def _axis_uniform(lut: Dict, axis: str) -> bool:
    flags = lut.get("_uniform")
    return True if flags is None else bool(flags[axis])


def trim_lut_bounds(lut: Dict, lbkg_min: float = 0.1,
                    lbkg_max: Optional[float] = None):
    """Y-grid knot range [lo, hi] the scorers can actually weight, plus a
    LUT copy with Y/Y_log sliced to it.

    The fused band scorers clamp the background luminance to >= 0.1 cd/m^2
    in-kernel (the contrast pyramid's clamp, pyfvvdp/fvvdp_lpyr_dec.py:264)
    and display photometry bounds it above by the peak luminance, so hat /
    delta taps outside [lbkg_min, lbkg_max] receive exactly zero weight;
    dropping them shrinks the per-pixel interpolation loop (~32 -> ~19 knots
    for a 200 cd/m^2 SDR display).  One guard knot is kept on each side so
    every in-range evaluation keeps its exact support.  Returns
    ``(lo, hi, lut')`` — ``(0, n-1, lut)`` when nothing can be trimmed
    (non-uniform grid, tiny grid, or full range needed).
    """
    Y_log = np.asarray(lut["Y_log"]).reshape(-1)
    Y = np.asarray(lut["Y"]).reshape(-1)
    n = Y_log.shape[0]
    if not _axis_uniform(lut, "Y_log") or n < 4:
        return 0, n - 1, lut
    y0 = float(Y_log[0])
    dy = float((Y_log[-1] - y0) / (n - 1))
    u_min = (np.log2(max(float(lbkg_min), float(Y[0]))) - y0) / dy
    lo = max(0, int(np.floor(u_min)) - 1)
    if lbkg_max is None or not np.isfinite(lbkg_max):
        hi = n - 1
    else:
        u_max = (np.log2(min(max(float(lbkg_max), float(lbkg_min)),
                             float(Y[-1]))) - y0) / dy
        hi = min(n - 1, int(np.ceil(u_max)) + 1)
    hi = max(hi, lo + 1)
    if lo == 0 and hi == n - 1:
        return lo, hi, lut
    lut2 = dict(lut)
    lut2["Y_log"] = Y_log[lo:hi + 1]
    lut2["Y"] = Y[lo:hi + 1]
    return lo, hi, lut2


def trim_lut_range(tables, lut: Dict, lbkg_min: float = 0.1,
                   lbkg_max: Optional[float] = None):
    """Slice Y-LAST-axis ``tables`` to the weightable knot range (see
    :func:`trim_lut_bounds`).  Returns ``(tables[..., lo:hi+1], lut')``."""
    lo, hi, lut2 = trim_lut_bounds(lut, lbkg_min, lbkg_max)
    if lut2 is lut:
        return tables, lut
    return np.asarray(tables)[..., lo:hi + 1], lut2


def rho_window_weights(lut: Dict, rho_map: np.ndarray):
    """Static per-band rho-axis preparation for the per-frame (moving-gaze)
    table collapse.

    A band's per-pixel spatial frequencies rho_band * res_mag(pixel) span
    only a small slice of the rho grid (log2 spacing ~0.39 octaves; the
    resolution magnification is a modest factor), so the per-frame collapse
    can run against a window of a few knots instead of all 32.  Returns
    ``(r_lo, r_hi, w_r)`` where ``w_r`` (h, w, r_hi-r_lo+1) holds exactly the
    reference 2-point interpolation weights (semantics of
    pyfvvdp/interp.py:11-20, as in :func:`_grid_weights`) restricted to the
    window — terms outside it have exactly zero weight, so the windowed
    contraction equals the full one.
    """
    # float32 throughout — bit-matches the traced _grid_weights computation
    grid = np.asarray(lut["rho_log"], np.float32)
    n = grid.shape[0]
    q = np.log2(np.clip(np.asarray(rho_map, np.float32),
                        np.float32(np.asarray(lut["rho"])[0]),
                        np.float32(np.asarray(lut["rho"])[-1])))
    shape = q.shape
    q = q.reshape(-1)
    if _axis_uniform(lut, "rho_log"):
        x0 = grid[0]
        dx = np.float32((grid[-1] - grid[0]) / np.float32(n - 1))
        u = np.clip((q - x0) / dx, np.float32(0.0), np.float32(n - 1))
        i_lo = np.floor(u).astype(np.int64)
        f = (u - i_lo).astype(np.float32)
        i_hi = np.minimum(i_lo + 1, n - 1)
    else:
        i_hi = np.minimum(np.sum(grid[None, :] < q[:, None], axis=-1), n - 1)
        i_lo = np.clip(i_hi - 1, 0, n - 1)
        x_lo, x_hi = grid[i_lo], grid[i_hi]
        f = ((q - x_lo) / (x_hi - x_lo + np.float32(1e-6))).astype(np.float32)
        f = np.where((i_hi == i_lo) | (f < 0.0), 0.0, f).astype(np.float32)
    r_lo = int(i_lo.min())
    r_hi = int(i_hi.max())
    n_r = r_hi - r_lo + 1
    w_r = np.zeros((q.shape[0], n_r), np.float32)
    np.put_along_axis(w_r, (i_lo - r_lo)[:, None], (1.0 - f)[:, None], 1)
    # i_hi == i_lo at the clamped top end: accumulate, don't overwrite
    hi_w = np.take_along_axis(w_r, (i_hi - r_lo)[:, None], 1) \
        + np.where(i_hi == i_lo, 0.0, f)[:, None]
    np.put_along_axis(w_r, (i_hi - r_lo)[:, None], hi_w, 1)
    return r_lo, r_hi, w_r.reshape(shape + (n_r,))


def ecc_weights(lut: Dict, ecc):
    """Per-pixel 2-point interpolation weights along the ecc axis (n_e wide),
    with the reference clamp semantics."""
    ecc_q = jnp.sqrt(jnp.clip(ecc, lut["ecc"][0], lut["ecc"][-1]))
    return _grid_weights(ecc_q, lut["ecc_sqrt"], _axis_uniform(lut, "ecc_sqrt"))


def reduce_lut_to_pixel_tables(lut: Dict[str, jnp.ndarray], rho, ecc):
    """Collapse the 3-D LUT over its (rho, ecc) axes with PER-PIXEL static
    maps -> (n, h, w) plane-major S_log(Y_log) tables.

    This is the fixed-gaze foveated fast path: when the fixation point does
    not move, rho (spatial frequency x resolution magnification) and ecc
    (eccentricity) are static per band, so the expensive two-axis
    interpolation runs ONCE per video here, and the per-frame work reduces
    to the same 1-D luminance interpolation as the non-foveated path.
    Exactly equal to sensitivity_trilinear by associativity of linear
    interpolation.  Plane-major layout so the fused Pallas scorer can slice
    whole knot planes per VMEM tile.
    """
    shape = jnp.shape(ecc)
    rho = jnp.broadcast_to(jnp.asarray(rho, jnp.float32), shape).reshape(-1)
    ecc = jnp.reshape(jnp.asarray(ecc, jnp.float32), (-1,))

    rho_q = jnp.log2(jnp.clip(rho, lut["rho"][0], lut["rho"][-1]))
    ecc_q = jnp.sqrt(jnp.clip(ecc, lut["ecc"][0], lut["ecc"][-1]))

    V = lut["S_log"]                       # [Y, rho, ecc] = (n, n, n)
    n = V.shape[0]
    N = rho.shape[0]
    chunk = min(_TRILINEAR_CHUNK, N)
    n_chunks = -(-N // chunk)
    pad = n_chunks * chunk - N
    if pad:
        rho_q = jnp.concatenate([rho_q, jnp.zeros((pad,), rho_q.dtype)])
        ecc_q = jnp.concatenate([ecc_q, jnp.zeros((pad,), ecc_q.dtype)])

    u_r = _axis_uniform(lut, "rho_log")
    u_e = _axis_uniform(lut, "ecc_sqrt")

    def one_chunk(args):
        rq, eq = args
        w_r = _grid_weights(rq, lut["rho_log"], u_r)    # (c, n)
        w_e = _grid_weights(eq, lut["ecc_sqrt"], u_e)   # (c, n)
        B = jnp.einsum("yjk,pk->pyj", V, w_e, precision=_PREC)           # (c, n, n)
        return jnp.einsum("pyj,pj->py", B, w_r, precision=_PREC)         # (c, n)

    T = jax.lax.map(one_chunk, (rho_q.reshape(n_chunks, chunk),
                                ecc_q.reshape(n_chunks, chunk)))
    return jnp.moveaxis(T.reshape(-1, n)[:N].reshape(shape + (n,)), -1, 0)


def grid_index_coord(q, grid, uniform: bool):
    """Query positions as fractional INDEX coordinates of ``grid``: i_lo + f
    with the reference cell-search semantics (clamped ends, zeroed negative
    fractions).  The telescoped delta interpolation consumes this directly;
    uniform grids reduce to pure index arithmetic, monotone grids use the
    gather-free comparison count."""
    n = grid.shape[0]
    if uniform:
        x0 = grid[0]
        dx = (grid[-1] - grid[0]) / (n - 1)
        return jnp.clip((q - x0) / dx, 0.0, float(n - 1))
    qf = q[..., None]
    i_hi = jnp.minimum(jnp.sum((grid < qf).astype(jnp.int32), axis=-1), n - 1)
    i_lo = jnp.clip(i_hi - 1, 0, n - 1)
    oh_lo = jax.nn.one_hot(i_lo, n, dtype=q.dtype)
    oh_hi = jax.nn.one_hot(i_hi, n, dtype=q.dtype)
    x_lo = jnp.matmul(oh_lo, grid, precision=_PREC)
    x_hi = jnp.matmul(oh_hi, grid, precision=_PREC)
    f = (q - x_lo) / (x_hi - x_lo + 1e-6)
    f = jnp.where((i_hi == i_lo) | (f < 0.0), 0.0, f)
    return i_lo.astype(q.dtype) + f


def sensitivity_pixel_tables(lut: Dict[str, jnp.ndarray], tables, L_bkg):
    """Per-pixel S from plane-major per-pixel S_log(Y_log) tables (n, h, w);
    L_bkg may carry leading frame axes.  Telescoped delta form — pure fused
    FMAs, no (npix, n) one-hot intermediate and no matmul rounding."""
    Yq = jnp.log2(jnp.clip(L_bkg, lut["Y"][0], lut["Y"][-1]))
    u = grid_index_coord(Yq, lut["Y_log"], _axis_uniform(lut, "Y_log"))
    n = tables.shape[0]
    s_log = jnp.zeros_like(u) + tables[0]
    for i in range(n - 1):
        s_log = s_log + (tables[i + 1] - tables[i]) * jnp.clip(
            u - float(i), 0.0, 1.0)
    return jnp.power(2.0, s_log)


def sensitivity_1d(lut: Dict[str, jnp.ndarray], table_1d, L_bkg):
    """Per-pixel S from a pre-reduced 1-D S_log(Y_log) table.

    The shipped LUTs' Y grid is uniform in log2 space, so the cell index is
    direct arithmetic (non-uniform user LUTs take the comparison-count
    path); the 2-point interpolation is expressed as a one-hot contraction,
    which XLA fuses into dense VPU/MXU work — per-pixel gathers are
    pathologically slow on TPU.
    """
    Yq = jnp.log2(jnp.clip(L_bkg, lut["Y"][0], lut["Y"][-1]))
    oh = _grid_weights(Yq, lut["Y_log"], _axis_uniform(lut, "Y_log"))
    s_log = jnp.matmul(oh, jnp.asarray(table_1d), precision=_PREC)
    return jnp.power(2.0, s_log)


_TRILINEAR_CHUNK = 16384


def sensitivity_trilinear(lut: Dict[str, jnp.ndarray], rho, L_bkg, ecc):
    """Per-pixel S(rho, L, ecc) via dense one-hot contractions.

    Gather-free trilinear interpolation for the foveated path: all three LUT
    axes are uniform in their transformed spaces, so interpolation weights
    are index arithmetic, and the 8-corner sum becomes three successive
    contractions with the 32^3 table — MXU/VPU work instead of per-pixel
    gathers (which are ~1000x slower on TPU).  Processes pixels in chunks to
    bound the (chunk, 32, 32) intermediate.
    """
    shape = jnp.shape(L_bkg)
    rho = jnp.broadcast_to(jnp.asarray(rho, jnp.float32), shape).reshape(-1)
    ecc = jnp.broadcast_to(jnp.asarray(ecc, jnp.float32), shape).reshape(-1)
    L = jnp.reshape(L_bkg, (-1,))

    rho_q = jnp.log2(jnp.clip(rho, lut["rho"][0], lut["rho"][-1]))
    Y_q = jnp.log2(jnp.clip(L, lut["Y"][0], lut["Y"][-1]))
    ecc_q = jnp.sqrt(jnp.clip(ecc, lut["ecc"][0], lut["ecc"][-1]))

    V = lut["S_log"]                      # [Y, rho, ecc] = (32, 32, 32)
    n = V.shape[0]
    N = L.shape[0]
    chunk = min(_TRILINEAR_CHUNK, N)
    n_chunks = -(-N // chunk)
    pad = n_chunks * chunk - N
    if pad:
        Y_q = jnp.concatenate([Y_q, jnp.zeros((pad,), Y_q.dtype)])
        rho_q = jnp.concatenate([rho_q, jnp.zeros((pad,), rho_q.dtype)])
        ecc_q = jnp.concatenate([ecc_q, jnp.zeros((pad,), ecc_q.dtype)])

    V_flat = V.reshape(n, n * n)

    u_y = _axis_uniform(lut, "Y_log")
    u_r = _axis_uniform(lut, "rho_log")
    u_e = _axis_uniform(lut, "ecc_sqrt")

    def one_chunk(args):
        yq, rq, eq = args
        w_y = _grid_weights(yq, lut["Y_log"], u_y)      # (c, 32)
        w_r = _grid_weights(rq, lut["rho_log"], u_r)    # (c, 32)
        w_e = _grid_weights(eq, lut["ecc_sqrt"], u_e)   # (c, 32)
        A = jnp.matmul(w_y, V_flat, precision=_PREC).reshape(-1, n, n)            # (c, rho, ecc)
        B = jnp.einsum("pik,pi->pk", A, w_r, precision=_PREC)            # (c, ecc)
        return jnp.sum(B * w_e, axis=-1)                # (c,)

    s_log = jax.lax.map(one_chunk, (Y_q.reshape(n_chunks, chunk),
                                    rho_q.reshape(n_chunks, chunk),
                                    ecc_q.reshape(n_chunks, chunk)))
    s_log = s_log.reshape(-1)[:N].reshape(shape)
    return jnp.power(2.0, s_log)


def sensitivity_trilinear_block(lut: Dict[str, jnp.ndarray], rho_map,
                                L_bkg, ecc):
    """Trilinear S for a BLOCK of frames sharing a static per-pixel rho map.

    Exactly :func:`sensitivity_trilinear` reassociated: spatial frequency
    (band frequency x resolution magnification) does not depend on the gaze,
    so its LUT axis is collapsed ONCE per pixel — ``G[p] = V @ w_rho[p]``,
    a (n, n) S_log(Y, ecc) table — and every frame of the block reuses ``G``
    with its own (luminance, eccentricity) bilinear.  Per pixel that is
    n*n*n + F*(n*n + n) MACs instead of F*(n*n*n + n*n + n): ~16x fewer at
    F=30 for the moving-gaze foveated path.

    ``rho_map``: (h, w) frame-invariant; ``L_bkg``/``ecc``: (F, h, w) (ecc
    may be (h, w), broadcast over frames).  Returns (F, h, w).
    """
    F = L_bkg.shape[0]
    shape = jnp.shape(L_bkg)[1:]
    rho = jnp.broadcast_to(jnp.asarray(rho_map, jnp.float32), shape).reshape(-1)
    ecc = jnp.broadcast_to(jnp.asarray(ecc, jnp.float32),
                           (F,) + shape).reshape(F, -1)
    L = jnp.reshape(L_bkg, (F, -1))

    rho_q = jnp.log2(jnp.clip(rho, lut["rho"][0], lut["rho"][-1]))
    Y_q = jnp.log2(jnp.clip(L, lut["Y"][0], lut["Y"][-1]))
    ecc_q = jnp.sqrt(jnp.clip(ecc, lut["ecc"][0], lut["ecc"][-1]))

    V = lut["S_log"]                      # [Y, rho, ecc] = (n, n, n)
    n = V.shape[0]
    N = rho.shape[0]
    chunk = min(8192, N)
    n_chunks = -(-N // chunk)
    pad = n_chunks * chunk - N
    if pad:
        rho_q = jnp.concatenate([rho_q, jnp.zeros((pad,), rho_q.dtype)])
        Y_q = jnp.concatenate([Y_q, jnp.zeros((F, pad), Y_q.dtype)], axis=1)
        ecc_q = jnp.concatenate([ecc_q, jnp.zeros((F, pad), ecc_q.dtype)],
                                axis=1)

    u_y = _axis_uniform(lut, "Y_log")
    u_r = _axis_uniform(lut, "rho_log")
    u_e = _axis_uniform(lut, "ecc_sqrt")

    def one_chunk(args):
        rq, yq, eq = args                              # (c,), (F, c), (F, c)
        w_r = _grid_weights(rq, lut["rho_log"], u_r)   # (c, n)
        G = jnp.einsum("pj,yje->pye", w_r, V, precision=_PREC)          # (c, n, n) once/block
        w_y = _grid_weights(yq, lut["Y_log"], u_y)     # (F, c, n)
        w_e = _grid_weights(eq, lut["ecc_sqrt"], u_e)  # (F, c, n)
        B = jnp.einsum("fpy,pye->fpe", w_y, G, precision=_PREC)         # (F, c, n)
        return jnp.sum(B * w_e, axis=-1)               # (F, c)

    s_log = jax.lax.map(one_chunk,
                        (rho_q.reshape(n_chunks, chunk),
                         Y_q.reshape(F, n_chunks, chunk).transpose(1, 0, 2),
                         ecc_q.reshape(F, n_chunks, chunk).transpose(1, 0, 2)))
    s_log = s_log.transpose(1, 0, 2).reshape(F, -1)[:, :N]
    return jnp.power(2.0, s_log).reshape((F,) + shape)


def sensitivity(lut: Dict[str, jnp.ndarray], rho, L_bkg, ecc):
    """Interpolated sensitivity S(rho, L_bkg, ecc) from a LUT.

    Queries are clamped to the grid in linear space, then mapped into the
    grid's (log2 rho, log2 Y, sqrt ecc) axes — same semantics as
    pyfvvdp/fvvdp.py:529-537.  ``rho`` and ``ecc`` may be scalars; they are
    broadcast against ``L_bkg``.
    """
    rho = jnp.broadcast_to(jnp.asarray(rho, jnp.float32), jnp.shape(L_bkg))
    ecc = jnp.broadcast_to(jnp.asarray(ecc, jnp.float32), jnp.shape(L_bkg))

    rho_q = jnp.log2(jnp.clip(rho, lut["rho"][0], lut["rho"][-1]))
    Y_q = jnp.log2(jnp.clip(L_bkg, lut["Y"][0], lut["Y"][-1]))
    ecc_q = jnp.sqrt(jnp.clip(ecc, lut["ecc"][0], lut["ecc"][-1]))

    s_log = interp3(lut["rho_log"], lut["Y_log"], lut["ecc_sqrt"], lut["S_log"],
                    rho_q, Y_q, ecc_q)
    return jnp.power(2.0, s_log)
