"""Functional metric core: pure, jit-compiled scoring of frame blocks.

This is the TPU-first replacement for the reference's per-frame Python loop
(pyfvvdp/fvvdp.py:248-478).  The whole per-frame pipeline — temporal channel
filtering, contrast pyramid, CSF, masking, per-band pooling and (optionally)
heatmap rendering — is traced once per (resolution, block size) into a single
XLA program operating on a *block* of frames, so the per-frame dispatch and
O(filter_len) redundant sliding-window arithmetic of the reference disappear.

Layout convention inside the core: (F, C, H, W) with C = 2*temp_ch channels
ordered [test-sustained, ref-sustained, test-transient, ref-transient]
(same ordering as fvvdp.py:293).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fovvideovdp_tpu import csf as csf_mod
from fovvideovdp_tpu.ops import masking as mask_ops
from fovvideovdp_tpu.ops import temporal as temporal_ops
from fovvideovdp_tpu.ops.pyramid import PyramidPlan
from fovvideovdp_tpu.visualize import visualize_diff_map_frames


class MetricCore:
    """Holds the static configuration and builds/caches jitted block scorers.

    Parameters
    ----------
    plan : PyramidPlan for the content resolution & display ppd.
    params : calibration parameter dict (fvvdp_parameters.json contents).
    luts : per-temporal-channel CSF LUTs (omega = 0 and 5 Hz).
    geometry : display geometry (used only when foveated).
    foveated : enable eccentricity-dependent sensitivity.
    heatmap : None | "raw" | "threshold" | "supra-threshold" | "monochromatic".
    """

    # distinct static fixation points whose per-pixel CSF tables stay
    # resident in HBM (each 4K entry is GB-scale — unbounded caching would
    # OOM the chip after a handful of distinct gazes)
    _FOV_CACHE_ENTRIES = 2

    def __init__(self, plan: PyramidPlan, params: Dict, luts: Sequence[Dict],
                 geometry=None, foveated: bool = False,
                 heatmap: Optional[str] = None, content_mapping=None,
                 ignore_boundary_pixels: bool = False, band_callback=None,
                 peak_luminance: Optional[float] = None,
                 heatmap_dtype: str = "float16"):
        self.plan = plan
        self.params = params
        self.luts = tuple(luts)
        self.geometry = geometry
        self.foveated = foveated
        self.heatmap = heatmap
        self.do_heatmap = heatmap is not None and heatmap != "none"
        if heatmap_dtype not in ("float16", "uint8"):
            raise ValueError(f"heatmap_dtype must be 'float16' or 'uint8', "
                             f"got {heatmap_dtype!r}")
        if heatmap_dtype == "uint8" and heatmap == "raw":
            # raw maps are unbounded JOD-scale magnitudes; 8-bit quantisation
            # only makes sense for the display-referred colormapped outputs
            raise ValueError("heatmap_dtype='uint8' requires a colormapped "
                             "heatmap type, not 'raw'")
        self.heatmap_dtype = heatmap_dtype
        self.content_mapping = content_mapping
        self.ignore_boundary_pixels = ignore_boundary_pixels
        self.band_callback = band_callback
        self.local_adapt = params.get("local_adapt", "gpyr")
        self.contrast = params.get("contrast", "weber")
        self.masking_model = params.get("masking_model",
                                        "min_mutual_masking_perc_norm2")
        self._fn_cache: Dict = {}
        self._fov_table_cache: Dict = {}  # insertion-ordered dict as LRU
        self._mov_cache: Dict = {}  # per-band static data, moving-gaze path
        # Both shipped LUTs (omega = 0/5 Hz) share one Y grid, letting the
        # fused kernel score both temporal channels in a single pass.
        self._luts_share_Y = (
            len(self.luts) >= 2
            and np.array_equal(np.asarray(self.luts[0]["Y_log"]),
                               np.asarray(self.luts[1]["Y_log"]))
            and np.array_equal(np.asarray(self.luts[0]["Y"]),
                               np.asarray(self.luts[1]["Y"])))

        # Static per-band foveation maps (resolution magnification does not
        # depend on gaze; eccentricity does and is computed in-graph).
        self._band_rho: List = []
        self._band_view_dir: List = []
        # Non-foveated fast path: per (band, channel) the LUT collapses to a
        # 1-D table in luminance (rho and ecc are compile-time constants), and
        # per-pixel evaluation becomes a one-hot contraction — TPU gathers
        # from the 3-D LUT are ~1000x slower.
        self._band_tables: List = []
        rho_band = plan.get_freqs()
        for bb in range(plan.height):
            h, w = plan.level_shapes[bb]
            if not foveated:
                self._band_tables.append(tuple(
                    csf_mod.reduce_lut_to_1d(self.luts[cc], float(rho_band[bb]), 0.0)
                    for cc in range(len(self.luts))))
            if foveated:
                xv = np.linspace(0.5, w - 0.5, w, dtype=np.float32)
                yv = np.linspace(0.5, h - 0.5, h, dtype=np.float32)
                xx, yy = np.meshgrid(xv, yv)  # xy indexing
                view_dir = geometry.pix2view_direction((w, h), jnp.asarray(xx),
                                                       jnp.asarray(yy))
                res_mag = geometry.get_resolution_magnification(view_dir)
                self._band_rho.append(jnp.asarray(rho_band[bb] * res_mag,
                                                  dtype=jnp.float32))
                self._band_view_dir.append(jnp.asarray(view_dir, dtype=jnp.float32))
            else:
                self._band_rho.append(float(rho_band[bb]))
                self._band_view_dir.append(None)

        # Range-trimmed copies for the fused two-channel scorers: Y-grid
        # knots outside the achievable background-luminance range
        # [0.1, peak_luminance] are sliced away (csf.trim_lut_range), which
        # shrinks the kernels' per-pixel interpolation loop.
        self.peak_luminance = peak_luminance
        self._score_tables: List = []
        self._score_lut: Optional[Dict] = None
        if not foveated and self._luts_share_Y and self._band_tables:
            lut2 = self.luts[0]
            for bb in range(plan.height):
                t2, lut2 = csf_mod.trim_lut_range(
                    np.stack(self._band_tables[bb][:2]), self.luts[0],
                    lbkg_max=peak_luminance)
                self._score_tables.append(t2)
            self._score_lut = lut2
        # Foveated fixed-gaze: the per-pixel tables get the same Y-knot trim
        # (~32 -> ~19 planes: less kernel work AND a ~40% cut of the
        # GB-scale table cache).  Valid only where L_bkg is guaranteed inside
        # [0.1, peak] — the default contrast-pyramid path; the local-adapt /
        # log-contrast ablations keep the full grid.
        self._fov_trim = None
        self._fov_lut: Optional[Dict] = None
        if foveated and self._luts_share_Y and self.local_adapt == "gpyr" \
                and self.contrast != "log":
            lo, hi, lut2 = csf_mod.trim_lut_bounds(self.luts[0],
                                                   lbkg_max=peak_luminance)
            if lut2 is not self.luts[0]:
                self._fov_trim = (lo, hi)
                self._fov_lut = lut2

    # ------------------------------------------------------------------
    # scoring of a block of temporal-response frames
    # ------------------------------------------------------------------
    def _gaze_directions(self, gaze: jnp.ndarray) -> jnp.ndarray:
        """gaze (F, 2) pixel coords -> view directions (2, F) in degrees."""
        return self.geometry.pix2view_direction(
            (self.plan.W, self.plan.H), gaze[:, 0] + 0.5, gaze[:, 1] + 0.5)

    def fov_tables(self, gaze_xy):
        """Per-band, per-channel (h, w, n) S_log(Y_log) tables for a STATIC
        fixation point — the LUT's (rho, ecc) axes are collapsed once per
        video here, so the per-frame foveated CSF costs the same as the
        non-foveated 1-D path (the reference exploits the same invariance by
        caching N_nCSF per band for a fixed gaze, pyfvvdp/fvvdp.py:414).

        Costs n_grid floats of HBM per pixel per band per channel; computed
        on device, cached for the most recent fixation points only (one 4K
        entry is GB-scale — an unbounded cache would OOM the chip after a
        handful of distinct gazes).
        """
        key = (float(gaze_xy[0]), float(gaze_xy[1]))
        if key in self._fov_table_cache:          # LRU refresh
            self._fov_table_cache[key] = self._fov_table_cache.pop(key)
        else:
            while len(self._fov_table_cache) >= self._FOV_CACHE_ENTRIES:
                self._fov_table_cache.pop(next(iter(self._fov_table_cache)))
            gaze_dir = self.geometry.pix2view_direction(
                (self.plan.W, self.plan.H),
                jnp.asarray([key[0] + 0.5]), jnp.asarray([key[1] + 0.5]))
            gaze_dir = jnp.reshape(jnp.asarray(gaze_dir), (2, 1, 1))
            tabs = []
            for bb in range(self.plan.height):
                vd = self._band_view_dir[bb]          # (2, h, w)
                ecc = jnp.sqrt(jnp.sum((vd - gaze_dir) ** 2, axis=0))
                rho = self._band_rho[bb]              # (h, w)
                per_cc = []
                for cc in range(len(self.luts)):
                    t = csf_mod.reduce_lut_to_pixel_tables(
                        self.luts[cc], rho, ecc)
                    if self._fov_trim is not None:
                        lo, hi = self._fov_trim
                        t = t[lo:hi + 1]
                    per_cc.append(t)
                tabs.append(tuple(per_cc))
            jax.block_until_ready(tabs)
            self._fov_table_cache[key] = tabs
        return self._fov_table_cache[key]

    # -- moving-gaze foveated fast path ---------------------------------------
    def _moving_band_data(self, bb: int):
        """Static per-band data for the fused moving-gaze path: the LUT
        sliced to the band's reachable rho knots and the display's
        weightable Y knots, laid out for the per-frame ecc collapse (one
        (pixels, n_e) x (n_e, n_y*n_r) matmul per frame), plus the static
        per-pixel rho weights.  The omega=5 LUT reduces to a scalar log2-S
        offset when the temporal modulation factors out of the Daly CSF
        (true for the shipped calibration pair).

        The cache holds HOST (numpy) arrays on purpose: this method is
        first reached inside a trace (jit/shard_map), where a ``jnp``
        conversion returns a trace-local TRACER — caching that leaks it
        into every later program using the same core (observed as
        UnexpectedTracerError when a sharded block trace preceded a sharded
        scan trace).  Each consuming trace lifts the numpy constants
        itself."""
        if bb in self._mov_cache:
            return self._mov_cache[bb]
        lut = self.luts[0]
        n = np.asarray(lut["S_log"]).shape[0]
        r_lo, r_hi, w_r = csf_mod.rho_window_weights(
            lut, np.asarray(self._band_rho[bb]))
        y_lo, y_hi = self._fov_trim if self._fov_trim is not None \
            else (0, n - 1)
        S0 = np.asarray(lut["S_log"])[y_lo:y_hi + 1, r_lo:r_hi + 1, :]
        S5 = np.asarray(self.luts[1]["S_log"])[y_lo:y_hi + 1,
                                               r_lo:r_hi + 1, :]
        ny, nr, ne = S0.shape
        diff = S5 - S0
        # collapse to the mean, not diff[0]: at the ptp tolerance boundary
        # the mean centres the residual (worst case 1e-5 log2 units) where
        # an arbitrary element could bias the whole channel by the full 2e-5
        off5 = float(diff.mean()) if np.ptp(diff) <= 2e-5 else None
        # window-local rho grid coordinate (h, w) for the in-kernel
        # trilinear (ops/pallas/mov_score.py) — the uniform-axis analogue
        # of w_r's 2-point weights: hat(t_r - k) == w_r[:, k] exactly
        t_r = None
        if csf_mod._axis_uniform(lut, "rho_log"):
            grid = np.asarray(lut["rho_log"], np.float32)
            dx = np.float32((grid[-1] - grid[0])
                            / np.float32(grid.shape[0] - 1))
            q = np.log2(np.clip(np.asarray(self._band_rho[bb], np.float32),
                                np.float32(np.asarray(lut["rho"])[0]),
                                np.float32(np.asarray(lut["rho"])[-1])))
            u = np.clip((q - grid[0]) / dx, np.float32(0.0),
                        np.float32(grid.shape[0] - 1))
            t_r = np.asarray(np.clip(u - np.float32(r_lo),
                                     0.0, np.float32(nr - 1)), np.float32)
        data = {
            "V2": np.ascontiguousarray(S0.reshape(ny * nr, ne).T,
                                       dtype=np.float32),
            "V2_5": None if off5 is not None
            else np.ascontiguousarray(S5.reshape(ny * nr, ne).T,
                                      dtype=np.float32),
            "off5": off5,
            "w_r": np.asarray(w_r.reshape(-1, nr), np.float32),  # (px, n_r)
            "t_r": t_r,
            "ny": ny, "nr": nr,
        }
        self._mov_cache[bb] = data
        return data

    def _mov_tables_for_frame(self, bb: int, ecc: jnp.ndarray):
        """One frame's per-pixel S_log(Y_log) tables (both temporal
        channels) from its eccentricity map — the moving-gaze analogue of
        :meth:`fov_tables`, cheap enough to run per frame: the ecc axis
        collapses in one MXU matmul against the windowed LUT and the static
        rho weights finish the trilinear.  Exactly equal (associativity of
        linear interpolation) to csf.sensitivity_trilinear_block's collapse.
        """
        d = self._moving_band_data(bb)
        h, w = ecc.shape
        lut = self.luts[0]
        w_e = csf_mod.ecc_weights(lut, ecc.reshape(-1))      # (p, n_e)
        B = jnp.matmul(w_e, d["V2"],
                       precision=csf_mod._PREC)              # (p, ny*nr)
        B = B.reshape(-1, d["ny"], d["nr"])
        T = jnp.einsum("pyr,pr->py", B, d["w_r"],
                       precision=csf_mod._PREC)              # (p, ny)
        tab_s = jnp.moveaxis(T.reshape(h, w, d["ny"]), -1, 0)
        if d["off5"] is not None:
            tab_t = tab_s + d["off5"]
        else:
            B5 = jnp.matmul(w_e, d["V2_5"], precision=csf_mod._PREC)
            T5 = jnp.einsum("pyr,pr->py", B5.reshape(-1, d["ny"], d["nr"]),
                            d["w_r"], precision=csf_mod._PREC)
            tab_t = jnp.moveaxis(T5.reshape(h, w, d["ny"]), -1, 0)
        return tab_s, tab_t

    # -- local adaptation / contrast variants --------------------------------
    def _score_frames_fused(self, R: jnp.ndarray, sens_corr: float
                            ) -> jnp.ndarray:
        """Default-path scorer with the per-level fused pipeline kernel.

        Decomposes R (F, 4, H, W) into its Gaussian pyramid (Pallas reduce
        chain) and scores each band with ops/pallas/band_pipeline.py — the
        per-band gain folds into the sensitivity correction (everything
        between the contrast and the absolute values is linear in it).
        Returns Q_per_ch (n_bands, 2, F)."""
        from fovvideovdp_tpu.ops.pallas import band_pipeline as bp
        p = self.params
        plan = self.plan
        n_bands = plan.get_band_count()
        gpyr = plan.gaussian_pyramid(R)
        Q_rows = []
        for bb in range(plan.height):
            gain = plan.band_gain(bb, n_bands)
            h, w = plan.level_shapes[bb]
            inv_norm = float(h * w) ** (1.0 / p["beta"])
            ssum2 = bp.expand_score2(
                gpyr[bb], gpyr[bb + 1], self._score_tables[bb],
                self._score_lut, p["mask_p"], p["mask_q_sust"],
                p["mask_q_trans"], p["mask_c"], sens_corr * gain,
                p["beta"])                      # (F, 2)
            Q_rows.append(jnp.transpose(
                jnp.power(ssum2, 1.0 / p["beta"]) / inv_norm))
        return jnp.stack(Q_rows, axis=0)        # (n_bands, 2, F)

    def _decompose_with_adaptation(self, R: jnp.ndarray):
        """Pyramid decomposition + background-luminance computation.

        Returns (bands, L_bkg per band (F, h, w), is_contrast) where
        ``is_contrast`` says whether bands already hold Weber contrast (the
        fused default path).  The non-default variants implement the MATLAB
        core's ablation modes (matlab/fvvdp_core.m:214-300).
        """
        from fovvideovdp_tpu.ops.pyramid import gausspyr_expand
        from fovvideovdp_tpu.utils import ImGaussFilt

        plan = self.plan
        la = self.local_adapt
        log_c = self.contrast == "log"

        if la == "gpyr" and not log_c:
            bands, L_bkg_pyr = plan.decompose_contrast(R)
            return bands, [lb[:, 0] for lb in L_bkg_pyr], True

        bands, gbands = plan.decompose(R)
        L_list = []

        if la == "simple":
            # 0.5 deg Gaussian blur of the reference sustained channel
            L_adapt = R[:, 1]
            if log_c:
                L_adapt = jnp.power(10.0, L_adapt)
            gf = ImGaussFilt(0.5 * plan.ppd)
            L_adapt = gf.run(L_adapt[:, None])[:, 0]  # (F, H, W)
        elif la == "global":
            # geometric mean of the reference sustained channel, per frame
            ref = R[:, 1]
            if log_c:
                ref = jnp.power(10.0, ref)
            L_adapt = jnp.exp(jnp.mean(jnp.log(jnp.clip(ref, 1e-8, None)),
                                       axis=(-2, -1)))

        for bb in range(plan.height):
            h, w = plan.level_shapes[bb]
            if la == "gpyr":  # log-contrast gpyr (fvvdp.py:487-490)
                g = gbands[bb + 1][:, 1]
                if log_c:
                    g = jnp.power(10.0, g)
                L_bkg = gausspyr_expand(g, (h, w))
            elif la == "gpyr0":
                g = gbands[bb][:, 1]
                L_bkg = jnp.power(10.0, g) if log_c else g
            elif la == "gpyr2":
                use_band = min(bb + 2, plan.height)
                g = gbands[use_band][:, 1]
                if log_c:
                    g = jnp.power(10.0, g)
                for br in range(use_band - 1, bb - 1, -1):
                    g = gausspyr_expand(g, plan.level_shapes[br])
                L_bkg = g
            elif la == "simple":
                L_bkg = jnp.clip(jax.image.resize(
                    L_adapt, (L_adapt.shape[0], h, w), method="cubic"),
                    1e-4, None)
            elif la == "global":
                L_bkg = jnp.broadcast_to(L_adapt[:, None, None],
                                         (L_adapt.shape[0], h, w))
            else:
                raise RuntimeError(f"Unknown type of local adaptation: {la}")
            L_list.append(L_bkg)
        return bands, L_list, False

    def _apply_masking(self, T, Rf, N_nCSF, cc):
        p = self.params
        model = self.masking_model
        if model == "contrast_difference":
            D = jnp.abs(T - Rf) / 0.05
        elif model == "contrast_difference_perc_norm":
            D = jnp.abs(T - Rf) / N_nCSF
        elif model == "min_mutual_masking_perc_norm2":
            q = (p["mask_q_sust"], p["mask_q_trans"])[cc]
            return mask_ops.apply_masking_model(
                T, Rf, N_nCSF, p["mask_p"], q, p["mask_c"],
                pu_dilate=float(p.get("pu_dilate", 0.0)))
        else:
            raise RuntimeError(f"Unknown masking model: {model}")
        return jnp.clip(D, None, 1e4)

    def score_frames(self, R: jnp.ndarray, gaze: Optional[jnp.ndarray],
                     temp_ch: int, fov_tables=None
                     ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """Score a block of temporal responses R (F, 2*temp_ch, H, W).

        ``fov_tables``: static-gaze per-pixel CSF tables from
        :meth:`fov_tables` (foveated fast path); None -> per-frame trilinear.
        Returns (Q_per_ch (n_bands, 2, F), heatmap (F, c, H, W) or None).
        """
        p = self.params
        plan = self.plan
        F = R.shape[0]
        sens_corr = 10.0 ** (p["sensitivity_correction"] / 20.0)
        w_temp_ch = (1.0, p["w_transient"])

        # Fully-fused default path: the whole per-band pipeline (Gaussian
        # expand, Weber contrast, CSF, masking, beta-norm partials) runs as
        # ONE Pallas kernel per level directly on the Gaussian pyramid —
        # contrast bands and L_bkg never touch HBM.
        from fovvideovdp_tpu.ops import pallas as pallas_cfg
        fused_base = (not self.do_heatmap
                      and self.contrast != "log"
                      and self.masking_model == "min_mutual_masking_perc_norm2"
                      and float(p.get("pu_dilate", 0.0)) == 0.0
                      # the Pallas kernels' LUT coordinate is index
                      # arithmetic, valid only for Y grids uniform in log2
                      and all(csf_mod._axis_uniform(l, "Y_log")
                              for l in self.luts)
                      and not self.ignore_boundary_pixels
                      and self.band_callback is None
                      and R.dtype == jnp.float32 and pallas_cfg.use_pallas())
        fused_common = fused_base and not self.foveated
        # fixed-gaze foveated: per-pixel CSF tables feed the fused scorer
        fov_fused = (fused_base and self.foveated and fov_tables is not None
                     and self._luts_share_Y and self.local_adapt == "gpyr")
        # moving-gaze foveated: per-FRAME per-pixel tables (MXU collapse of
        # the windowed LUT) feed the same fused scorer under a scan over
        # frames, replacing the block-amortised jnp trilinear
        mov_fused = (fused_base and self.foveated and fov_tables is None
                     and gaze is not None and self._luts_share_Y
                     and self.local_adapt == "gpyr"
                     and self.content_mapping is None
                     and all(csf_mod._axis_uniform(l, ax)
                             for l in self.luts
                             for ax in ("rho_log", "ecc_sqrt")))
        if (fused_common and temp_ch in (1, 2) and self._luts_share_Y
                and self.local_adapt == "gpyr"):
            if temp_ch == 1:
                # image path: zero transient channels score exactly 0 through
                # the pipeline (D(0,0) = 0), matching the unfused zero-fill
                R = jnp.concatenate([R, jnp.zeros_like(R)], axis=1)
            return self._score_frames_fused(R, sens_corr), None

        bands, L_bkg_list, is_contrast = self._decompose_with_adaptation(R)

        use_static_fov = self.foveated and fov_tables is not None
        gaze_dir = self._gaze_directions(gaze) \
            if self.foveated and not use_static_fov else None

        # Fused CSF+masking+norm Pallas path for the default configuration
        # (per band/channel, one VMEM pass, no HBM intermediates); everything
        # else uses the jnp composition below.
        fused_ok = fused_common and is_contrast

        Q_rows = []
        heat_bands: List[jnp.ndarray] = []
        n_bands = plan.get_band_count()
        for bb in range(plan.height):
            gain = plan.band_gain(bb, n_bands)
            band = bands[bb] * gain
            L_bkg = L_bkg_list[bb]               # (F, h, w)
            h, w = band.shape[-2], band.shape[-1]
            npix = h * w

            ecc_for_mapping = None
            if use_static_fov:
                ecc = None
                rho = None
            elif self.foveated:
                if self.content_mapping is not None:
                    xv = np.linspace(0.5, w - 0.5, w, dtype=np.float32)
                    yv = np.linspace(0.5, h - 0.5, h, dtype=np.float32)
                    xx, yy = np.meshgrid(xv, yv)
                    ecc = jax.vmap(lambda g: self.content_mapping.eccentricity(
                        (w, h), jnp.asarray(xx), jnp.asarray(yy),
                        g[0] + 0.5, g[1] + 0.5))(gaze)  # (F, h, w)
                    ecc_for_mapping = ecc
                else:
                    vd = self._band_view_dir[bb]  # (2, h, w)
                    diff = vd[:, None] - gaze_dir[:, :, None, None]
                    ecc = jnp.sqrt(jnp.sum(diff ** 2, axis=0))  # (F, h, w)
                rho = self._band_rho[bb]          # (h, w), broadcasts over F
            else:
                ecc = 0.0
                rho = self._band_rho[bb]

            Q_cc = []
            D_acc = None
            if mov_fused and is_contrast:
                from fovvideovdp_tpu.ops.pallas import band_score as bs
                from fovvideovdp_tpu.ops.pallas import mov_score as ms
                if ms.supports(h, w) \
                        and self._moving_band_data(bb)["t_r"] is not None:
                    # one dispatch per band per block: ecc + trilinear CSF
                    # computed IN the kernel — no per-frame tables in HBM
                    if temp_ch == 1:
                        zb = jnp.zeros_like(band[:, 0])
                        b4 = jnp.stack([band[:, 0], band[:, 1], zb, zb],
                                       axis=1)
                    else:
                        b4 = band
                    ssum2 = ms.band_score2_mov_pallas(
                        b4, L_bkg, self._moving_band_data(bb),
                        self._band_view_dir[bb], jnp.transpose(gaze_dir),
                        self.luts[0], self._fov_lut or self.luts[0],
                        p["mask_p"], p["mask_q_sust"], p["mask_q_trans"],
                        p["mask_c"], sens_corr, p["beta"])   # (F, 2)
                    inv_norm = float(npix) ** (1.0 / p["beta"])
                    Q_rows.append(jnp.transpose(
                        jnp.power(ssum2, 1.0 / p["beta"]) / inv_norm))
                    continue
                if bs.supports(h, w):
                    if temp_ch == 1:
                        zb = jnp.zeros_like(band[:, 0])
                        b4 = jnp.stack([band[:, 0], band[:, 1], zb, zb],
                                       axis=1)
                    else:
                        b4 = band
                    vd = self._band_view_dir[bb]          # (2, h, w)
                    kern_lut = self._fov_lut or self.luts[0]

                    def mov_body(_, xs, bb=bb, vd=vd, kern_lut=kern_lut):
                        b4_f, L_f, g_f = xs   # (4,h,w), (h,w), (2,)
                        ecc_f = jnp.sqrt(jnp.sum(
                            (vd - g_f[:, None, None]) ** 2, axis=0))
                        tab_s, tab_t = self._mov_tables_for_frame(bb, ecc_f)
                        ss = bs.band_score2_fov_pallas(
                            b4_f[None], L_f[None], tab_s, tab_t, kern_lut,
                            p["mask_p"], p["mask_q_sust"], p["mask_q_trans"],
                            p["mask_c"], sens_corr, p["beta"])
                        return 0, ss[0]                   # (2,)

                    _, ssum2 = jax.lax.scan(
                        mov_body, 0,
                        (b4, L_bkg, jnp.transpose(gaze_dir)))  # (F, 2)
                    inv_norm = float(npix) ** (1.0 / p["beta"])
                    Q_rows.append(jnp.transpose(
                        jnp.power(ssum2, 1.0 / p["beta"]) / inv_norm))
                    continue
            if fov_fused and is_contrast:
                from fovvideovdp_tpu.ops.pallas import band_score as bs
                if bs.supports(h, w):
                    if temp_ch == 1:
                        # image path: zero transient contrast scores exactly
                        # 0 through the kernel (D(0,0) = 0)
                        zb = jnp.zeros_like(band[:, 0])
                        b4 = jnp.stack([band[:, 0], band[:, 1], zb, zb],
                                       axis=1)
                    else:
                        b4 = band
                    ssum2 = bs.band_score2_fov_pallas(
                        b4, L_bkg, fov_tables[bb][0], fov_tables[bb][1],
                        self._fov_lut or self.luts[0], p["mask_p"],
                        p["mask_q_sust"], p["mask_q_trans"], p["mask_c"],
                        sens_corr, p["beta"])           # (F, 2)
                    inv_norm = float(npix) ** (1.0 / p["beta"])
                    Q_rows.append(jnp.transpose(
                        jnp.power(ssum2, 1.0 / p["beta"]) / inv_norm))
                    continue
            if fused_ok:
                from fovvideovdp_tpu.ops.pallas import band_score as bs
                if bs.supports(band.shape[-2], band.shape[-1]):
                    # (the shared-Y two-channel case never reaches here — it
                    # returned through the fully-fused path above; this loop
                    # serves per-channel LUTs, e.g. user .mat caches)
                    inv_norm = float(npix) ** (1.0 / p["beta"])
                    for cc in range(temp_ch):
                        ssum = bs.band_score_pallas(
                            band[:, cc * 2], band[:, cc * 2 + 1], L_bkg,
                            self._band_tables[bb][cc], self.luts[cc],
                            p["mask_p"],
                            (p["mask_q_sust"], p["mask_q_trans"])[cc],
                            p["mask_c"], sens_corr, p["beta"])
                        Q_cc.append(jnp.power(ssum, 1.0 / p["beta"])
                                    / inv_norm)
                    while len(Q_cc) < 2:
                        Q_cc.append(jnp.zeros((F,), dtype=R.dtype))
                    Q_rows.append(jnp.stack(Q_cc, axis=0))
                    continue
            for cc in range(temp_ch):
                T_f = band[:, cc * 2]
                R_f = band[:, cc * 2 + 1]
                if not is_contrast and self.contrast != "log":
                    # clamp L_bkg >= 0.1 before the division, matching the
                    # reference's compute_local_contrast (fvvdp.py:496-498)
                    # and the fused default path; the CSF below still sees the
                    # unclamped background luminance.
                    L_bkg_c = jnp.clip(L_bkg, 0.1, None)
                    T_f = jnp.clip(T_f / L_bkg_c, None, 1000.0)
                    R_f = jnp.clip(R_f / L_bkg_c, None, 1000.0)

                if use_static_fov:
                    S = csf_mod.sensitivity_pixel_tables(
                        self._fov_lut or self.luts[cc],
                        fov_tables[bb][cc], L_bkg)
                elif self.foveated:
                    # rho is frame-invariant: its LUT axis collapses once per
                    # pixel and all F frames of the block reuse the collapse
                    S = csf_mod.sensitivity_trilinear_block(
                        self.luts[cc], rho, L_bkg, ecc)
                else:
                    S = csf_mod.sensitivity_1d(self.luts[cc],
                                               self._band_tables[bb][cc], L_bkg)
                S = S * sens_corr
                if self.contrast == "log":
                    # log-contrast threshold (fvvdp.py:450,539-548)
                    N_nCSF = jnp.log10(1.0 + jnp.minimum(1.0 / S, 0.9999999))
                else:
                    N_nCSF = 1.0 / S

                if self.band_callback is not None:
                    jax.debug.callback(self.band_callback, bb, plan.height, cc,
                                       T_f, R_f, N_nCSF)

                D = self._apply_masking(T_f, R_f, N_nCSF, cc)

                if self.ignore_boundary_pixels:
                    # edge pixels see invalid symmetric padding
                    # (matlab/fvvdp_core.m:369-379)
                    cy, cx = min(3, h), min(3, w)
                    mask = jnp.zeros((h, w), dtype=D.dtype)
                    mask = mask.at[cy:h - cy, cx:w - cx].set(1.0)
                    D = D * mask
                if ecc_for_mapping is not None:
                    # nothing behind the viewer's head is visible
                    # (matlab/fvvdp_core.m:387-391)
                    D = jnp.where(ecc_for_mapping > 105.0, 0.0, D)

                q = jnp.power(
                    jnp.sum(jnp.power(jnp.abs(D), p["beta"]), axis=(-2, -1)),
                    1.0 / p["beta"]) / (float(npix) ** (1.0 / p["beta"]))
                Q_cc.append(q)                    # (F,)
                if self.do_heatmap:
                    D_acc = D if cc == 0 else D_acc + w_temp_ch[cc] * D
            while len(Q_cc) < 2:
                Q_cc.append(jnp.zeros((F,), dtype=R.dtype))
            Q_rows.append(jnp.stack(Q_cc, axis=0))  # (2, F)
            if self.do_heatmap:
                heat_bands.append((D_acc / gain)[:, None])  # (F, 1, h, w)

        Q_per_ch = jnp.stack(Q_rows, axis=0)  # (n_bands, 2, F)

        heat_out = None
        if self.do_heatmap:
            base = jnp.zeros((F, 1) + plan.level_shapes[plan.height], dtype=R.dtype)
            dmap = plan.reconstruct(heat_bands + [base])
            beta_jod = 10.0 ** p["log_jod_exp"]
            dmap = jnp.power(jnp.clip(dmap, 0.0, None), beta_jod) * abs(p["jod_a"])
            if self.heatmap == "raw":
                heat_out = dmap
            else:
                context = R[:, 0:1]  # test-sustained channel (fvvdp.py:475)
                heat_out = visualize_diff_map_frames(dmap, context, self.heatmap)
            if self.heatmap_dtype == "uint8":
                # display-referred RGB in [0,1]: quantise on device so the
                # host readback ships half the bytes of fp16 triples
                heat_out = jnp.round(
                    jnp.clip(heat_out, 0.0, 1.0) * 255.0).astype(jnp.uint8)
            else:
                heat_out = heat_out.astype(jnp.float16)
        return Q_per_ch, heat_out

    # ------------------------------------------------------------------
    # jitted entry points
    # ------------------------------------------------------------------
    def fov_table_bytes(self) -> int:
        """Estimated HBM footprint of ONE fixed-gaze per-pixel CSF table set
        (``fov_tables``): n_kept_knots x h x w float32 planes per band per
        temporal channel.  Used by block sizing and the scan-path budget —
        at 4K the tables are ~1.7 GB and stay resident through the whole
        run, so ignoring them compiles >HBM programs (observed: 4K foveated
        60-frame scan exceeded the 15.75 GB chip by 179 MB)."""
        if not self.foveated or self.content_mapping is not None:
            return 0
        if self._fov_trim is not None:
            n = self._fov_trim[1] - self._fov_trim[0] + 1
        else:
            n = int(np.shape(self.luts[0]["Y_log"])[0])
        px = sum(int(np.prod(r.shape)) for r in self._band_rho
                 if hasattr(r, "shape"))
        return n * len(self.luts) * px * 4

    def mov_kernel_available(self) -> bool:
        """Can this core score a foveated video through the fused in-kernel
        trilinear moving-gaze path (ops/pallas/mov_score)?  Used by the
        fixed-gaze auto-selection: when the per-pixel CSF tables would
        strangle the HBM block budget (4K), a CONSTANT per-frame gaze
        through the moving kernel is faster than the table path — but only
        when the kernel actually supports this configuration; otherwise the
        slower jnp fallbacks would make the switch a pessimisation."""
        from fovvideovdp_tpu.ops import pallas as pallas_cfg
        from fovvideovdp_tpu.ops.pallas import mov_score as ms
        if not (self.foveated and self.content_mapping is None
                and not self.do_heatmap and self.contrast != "log"
                and self.masking_model == "min_mutual_masking_perc_norm2"
                and float(self.params.get("pu_dilate", 0.0)) == 0.0
                and not self.ignore_boundary_pixels
                and self.band_callback is None
                and self._luts_share_Y and self.local_adapt == "gpyr"
                and pallas_cfg.use_pallas()):
            return False
        if not all(csf_mod._axis_uniform(l, ax) for l in self.luts
                   for ax in ("Y_log", "rho_log", "ecc_sqrt")):
            return False
        return ms.supports(self.plan.H, self.plan.W) \
            and self._moving_band_data(0)["t_r"] is not None

    def drop_fov_tables(self) -> None:
        """Free every cached fixed-gaze table set (GB-scale at 4K).  Called
        before moving-gaze scoring, which never reads them — without the
        eviction a fixed-then-moving sequence on the same metric OOMs the
        16 GB chip at 4K (observed as RESOURCE_EXHAUSTED on the next
        host->device transfer)."""
        self._fov_table_cache.clear()

    def _static_fov_tables(self, static_gaze):
        """Resolve the fixed-gaze CSF tables for the fn builders (None when
        the dynamic per-frame path must be used)."""
        if static_gaze is None or not self.foveated \
                or self.content_mapping is not None:
            return None
        return self.fov_tables(static_gaze)

    def image_fn(self, static_gaze=None):
        """Jitted scorer for a single image pair: (T, R) each (H, W) luminance
        [+ gaze (1, 2) when foveated with a moving gaze; a static fixation
        point is baked in via precomputed CSF tables]."""
        tables = self._static_fov_tables(static_gaze)
        # tables are passed as jit ARGUMENTS (closure-captured arrays would be
        # inlined into the HLO as constants — hundreds of MB of program)
        key = ("image", self.foveated, self.heatmap, tables is not None)
        if key not in self._fn_cache:
            if self.foveated and tables is None:
                def fn(T, Rf, gaze):
                    R = jnp.stack([T, Rf], axis=0)[None]  # (1, 2, H, W)
                    return self.score_frames(R, gaze, temp_ch=1)
            elif tables is not None:
                def fn(T, Rf, tabs):
                    R = jnp.stack([T, Rf], axis=0)[None]
                    return self.score_frames(R, None, temp_ch=1,
                                             fov_tables=tabs)
            else:
                def fn(T, Rf):
                    R = jnp.stack([T, Rf], axis=0)[None]
                    return self.score_frames(R, None, temp_ch=1)
            self._fn_cache[key] = jax.jit(fn)
        jitted = self._fn_cache[key]
        if tables is not None:
            return lambda T, Rf: jitted(T, Rf, tables)
        return jitted

    def image_block_fn(self, static_gaze=None):
        """Jitted scorer for a block of frames scored WITHOUT temporal
        channels (the MATLAB `do_temporal_channels=false` ablation,
        fvvdp_core.m:73): inputs (B, H, W) luminance pairs."""
        tables = self._static_fov_tables(static_gaze)
        key = ("image_block", self.foveated, self.heatmap, tables is not None)
        if key not in self._fn_cache:
            if self.foveated and tables is None:
                def fn(T, Rf, gaze):
                    R = jnp.stack([T, Rf], axis=1)  # (B, 2, H, W)
                    return self.score_frames(R, gaze, temp_ch=1)
            elif tables is not None:
                def fn(T, Rf, tabs):
                    R = jnp.stack([T, Rf], axis=1)
                    return self.score_frames(R, None, temp_ch=1,
                                             fov_tables=tabs)
            else:
                def fn(T, Rf):
                    R = jnp.stack([T, Rf], axis=1)
                    return self.score_frames(R, None, temp_ch=1)
            self._fn_cache[key] = jax.jit(fn)
        jitted = self._fn_cache[key]
        if tables is not None:
            return lambda T, Rf: jitted(T, Rf, tables)
        return jitted

    def video_block_fn(self, filt: np.ndarray, static_gaze=None):
        """Jitted scorer for a block of video frames.

        Takes padded luminance sequences (B + fl - 1, H, W) for test and
        reference [+ gaze (B, 2) for a moving gaze], applies the
        sustained/transient temporal filters and scores the B output frames.
        Shapes are static per (B, fl); the caller caches per distinct block
        size.  With ``static_gaze`` the foveated CSF uses tables collapsed
        once per fixation point instead of per-frame trilinear lookups.
        """
        tables = self._static_fov_tables(static_gaze)
        key = ("video", filt.shape[1], self.foveated, self.heatmap,
               filt.tobytes(), tables is not None)
        if key not in self._fn_cache:
            filt_np = np.asarray(filt, dtype=np.float32)
            gaze_in_sig = self.foveated and tables is None

            if tables is not None:
                def fn(padded_t, padded_r, tabs):
                    # (F, 4, H, W): T-sust, R-sust, T-trans, R-trans
                    R = temporal_ops.temporal_channels(padded_t, padded_r,
                                                       filt_np)
                    return self.score_frames(R, None, temp_ch=2,
                                             fov_tables=tabs)
            else:
                def fn(padded_t, padded_r, *maybe_gaze):
                    # order: T-sust, R-sust, T-trans, R-trans (fvvdp.py:293)
                    R = temporal_ops.temporal_channels(padded_t, padded_r,
                                                       filt_np)
                    gaze = maybe_gaze[0] if gaze_in_sig else None
                    return self.score_frames(R, gaze, temp_ch=2)

            self._fn_cache[key] = jax.jit(fn)
        jitted = self._fn_cache[key]
        if tables is not None:
            return lambda pt, pr: jitted(pt, pr, tables)
        return jitted

    def video_block_step_fn(self, filt: np.ndarray, static_gaze=None,
                            log_contrast: bool = False):
        """One whole streaming step under a single jit.

        Like :meth:`video_block_fn`, but the per-block host glue — optional
        log-luminance encoding, concatenation with the fl-1 carried frames,
        and slicing the next carry — happens inside the compiled program.
        On transports where every eager op is a round-trip this collapses
        ~6 dispatches per block into one.

        fn(carry_t, carry_r, new_t (B, H, W), new_r [, gaze (B, 2)]) ->
        (Q_per_ch, heatmap | None, carry_t', carry_r')."""
        tables = self._static_fov_tables(static_gaze)
        key = ("videostep", filt.shape[1], self.foveated, self.heatmap,
               filt.tobytes(), tables is not None, log_contrast)
        if key not in self._fn_cache:
            step = self._video_step(np.asarray(filt, dtype=np.float32),
                                    self.foveated and tables is None,
                                    tables is not None, log_contrast)
            self._fn_cache[key] = jax.jit(step)
        jitted = self._fn_cache[key]
        if tables is not None:
            return lambda ct, cr, nt, nr: jitted(ct, cr, nt, nr, tables)
        return jitted

    def _video_step(self, filt_np: np.ndarray, gaze_in_sig: bool,
                    use_tables: bool, log_contrast: bool):
        """Raw (unjitted) streaming step shared by :meth:`video_block_step_fn`
        (which jits one step per host dispatch) and :meth:`video_scan_fn`
        (which rolls the whole blocked schedule into one ``lax.scan``)."""
        fl = filt_np.shape[1]

        def step(carry_t, carry_r, new_t, new_r, *extra):
            if log_contrast:
                new_t = jnp.log10(jnp.clip(new_t, 1e-6, None))
                new_r = jnp.log10(jnp.clip(new_r, 1e-6, None))
            B = new_t.shape[0]
            if fl > 1:
                # the Pallas kernel reads carry and block separately, so
                # the (fl-1+B)-frame window is never materialised in HBM.
                # Big blocks split into several kernel calls; frames are
                # a pure batch dim in the scorer, so score each chunk and
                # concatenate only the per-frame partials — never the
                # (F, 4, H, W) responses themselves.
                chunks = temporal_ops.temporal_channels_pair_chunks(
                    carry_t, new_t, carry_r, new_r, filt_np)
            else:
                chunks = [temporal_ops.temporal_channels(
                    new_t, new_r, filt_np)]
            Qs, heats, off = [], [], 0
            for R in chunks:
                nf = R.shape[0]
                if use_tables:
                    q, h = self.score_frames(R, None, temp_ch=2,
                                             fov_tables=extra[0])
                else:
                    gaze = extra[0] if gaze_in_sig else None
                    if gaze is not None and gaze.ndim == 2:
                        gaze = gaze[off:off + nf]
                    q, h = self.score_frames(R, gaze, temp_ch=2)
                Qs.append(q)
                heats.append(h)
                off += nf
            if len(chunks) == 1:
                Q, heat = Qs[0], heats[0]
            else:
                Q = jnp.concatenate(Qs, axis=2)
                heat = (None if heats[0] is None
                        else jnp.concatenate(heats, axis=0))
            if fl - 1 <= 0:
                c_t, c_r = new_t[:0], new_r[:0]
            elif fl - 1 <= B:
                c_t, c_r = new_t[-(fl - 1):], new_r[-(fl - 1):]
            else:
                c_t = jnp.concatenate([carry_t, new_t], axis=0)[-(fl - 1):]
                c_r = jnp.concatenate([carry_r, new_r], axis=0)[-(fl - 1):]
            return Q, heat, c_t, c_r

        return step

    def video_scan_fn(self, filt: np.ndarray, block_frames: int,
                      chunk_blocks: int, static_gaze=None,
                      log_contrast: bool = False):
        """Multi-block scorer in ONE dispatch: ``lax.scan`` over frame blocks.

        For device-resident sources the streaming loop's per-block host
        dispatches (and their transport round-trips) are pure overhead — a
        CHUNK of ``chunk_blocks`` blocks compiles into a single XLA program
        whose scan body IS the streaming step (:meth:`_video_step`), so the
        numerics match the streaming path exactly.  The temporal carry is an
        explicit argument/result, so the caller chains chunks of a small
        fixed ladder of sizes to cover any video length — one compile per
        ladder rung serves every duration (a whole-video scan would
        re-specialise per length: n_blocks is a shape).  Heatmaps keep the
        streaming path: their per-block readback is the point of streaming.

        fn(carry_t, carry_r, chunk_t, chunk_r [, gaze (chunk_blocks, B, 2)])
        with ``carry_*`` = the fl-1 trailing frames of the preceding chunk
        (log-encoded already when ``log_contrast``) and ``chunk_*`` =
        (chunk_blocks*B, H, W) raw luminance ->
        (Q_per_ch (n_bands, 2, chunk_blocks*B), carry_t', carry_r').
        """
        if self.heatmap is not None:
            raise RuntimeError("the scan path scores without heatmaps; "
                               "use the streaming path")
        tables = self._static_fov_tables(static_gaze)
        key = ("videoscan", filt.shape[1], block_frames, chunk_blocks,
               self.foveated, filt.tobytes(), tables is not None,
               log_contrast)
        if key not in self._fn_cache:
            filt_np = np.asarray(filt, dtype=np.float32)
            gaze_in_sig = self.foveated and tables is None
            use_tables = tables is not None
            fl = filt_np.shape[1]
            B = block_frames
            K = chunk_blocks
            step = self._video_step(filt_np, gaze_in_sig, use_tables,
                                    log_contrast)

            def fn(carry_t, carry_r, chunk_t, chunk_r, *extra):
                sp = chunk_t.shape[1:]
                blocks_t = chunk_t.reshape((K, B) + sp)
                blocks_r = chunk_r.reshape((K, B) + sp)
                tabs = extra[0] if use_tables else None

                def body(c, xs):
                    if gaze_in_sig:
                        nt, nr, gz = xs
                        Q, _, ct, cr = step(c[0], c[1], nt, nr, gz)
                    elif use_tables:
                        nt, nr = xs
                        Q, _, ct, cr = step(c[0], c[1], nt, nr, tabs)
                    else:
                        nt, nr = xs
                        Q, _, ct, cr = step(c[0], c[1], nt, nr)
                    return (ct, cr), Q

                xs = (blocks_t, blocks_r)
                if gaze_in_sig:
                    xs = xs + (extra[0],)
                (ct, cr), Qs = jax.lax.scan(body, (carry_t, carry_r), xs)
                # (K, n_bands, 2, B) -> (n_bands, 2, K*B)
                return jnp.transpose(Qs, (1, 2, 0, 3)).reshape(
                    Qs.shape[1], 2, K * B), ct, cr

            self._fn_cache[key] = jax.jit(fn)
        jitted = self._fn_cache[key]
        if tables is not None:
            return lambda ct, cr, pt, pr: jitted(ct, cr, pt, pr, tables)
        return jitted
