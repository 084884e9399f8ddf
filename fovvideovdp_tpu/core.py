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

import functools
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

    def __init__(self, plan: PyramidPlan, params: Dict, luts: Sequence[Dict],
                 geometry=None, foveated: bool = False,
                 heatmap: Optional[str] = None):
        self.plan = plan
        self.params = params
        self.luts = tuple(luts)
        self.geometry = geometry
        self.foveated = foveated
        self.heatmap = heatmap
        self.do_heatmap = heatmap is not None and heatmap != "none"
        self._fn_cache: Dict = {}

        # Static per-band foveation maps (resolution magnification does not
        # depend on gaze; eccentricity does and is computed in-graph).
        self._band_rho: List = []
        self._band_view_dir: List = []
        rho_band = plan.get_freqs()
        for bb in range(plan.height):
            h, w = plan.level_shapes[bb]
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

    # ------------------------------------------------------------------
    # scoring of a block of temporal-response frames
    # ------------------------------------------------------------------
    def _gaze_directions(self, gaze: jnp.ndarray) -> jnp.ndarray:
        """gaze (F, 2) pixel coords -> view directions (2, F) in degrees."""
        return self.geometry.pix2view_direction(
            (self.plan.W, self.plan.H), gaze[:, 0] + 0.5, gaze[:, 1] + 0.5)

    def score_frames(self, R: jnp.ndarray, gaze: Optional[jnp.ndarray],
                     temp_ch: int) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """Score a block of temporal responses R (F, 2*temp_ch, H, W).

        Returns (Q_per_ch (n_bands, 2, F), heatmap (F, c, H, W) or None).
        """
        p = self.params
        plan = self.plan
        F = R.shape[0]
        sens_corr = 10.0 ** (p["sensitivity_correction"] / 20.0)
        w_temp_ch = (1.0, p["w_transient"])
        q_per_ch = (p["mask_q_sust"], p["mask_q_trans"])

        bands, L_bkg_pyr = plan.decompose_contrast(R)

        gaze_dir = self._gaze_directions(gaze) if self.foveated else None

        Q_rows = []
        heat_bands: List[jnp.ndarray] = []
        n_bands = plan.get_band_count()
        for bb in range(plan.height):
            gain = plan.band_gain(bb, n_bands)
            band = bands[bb] * gain
            L_bkg = L_bkg_pyr[bb][:, 0]          # (F, h, w)
            npix = band.shape[-2] * band.shape[-1]

            if self.foveated:
                vd = self._band_view_dir[bb]      # (2, h, w)
                diff = vd[:, None] - gaze_dir[:, :, None, None]
                ecc = jnp.sqrt(jnp.sum(diff ** 2, axis=0))  # (F, h, w)
                rho = self._band_rho[bb]          # (h, w), broadcasts over F
            else:
                ecc = 0.0
                rho = self._band_rho[bb]

            Q_cc = []
            D_acc = None
            for cc in range(temp_ch):
                S = csf_mod.sensitivity(self.luts[cc], rho, L_bkg, ecc) * sens_corr
                N_nCSF = 1.0 / S
                D = mask_ops.apply_masking_model(
                    band[:, cc * 2], band[:, cc * 2 + 1], N_nCSF,
                    p["mask_p"], q_per_ch[cc], p["mask_c"])
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
            heat_out = heat_out.astype(jnp.float16)
        return Q_per_ch, heat_out

    # ------------------------------------------------------------------
    # jitted entry points
    # ------------------------------------------------------------------
    def image_fn(self):
        """Jitted scorer for a single image pair: (T, R) each (H, W) luminance
        [+ gaze (1, 2) when foveated]."""
        key = ("image", self.foveated, self.heatmap)
        if key not in self._fn_cache:
            if self.foveated:
                def fn(T, Rf, gaze):
                    R = jnp.stack([T, Rf], axis=0)[None]  # (1, 2, H, W)
                    return self.score_frames(R, gaze, temp_ch=1)
            else:
                def fn(T, Rf):
                    R = jnp.stack([T, Rf], axis=0)[None]
                    return self.score_frames(R, None, temp_ch=1)
            self._fn_cache[key] = jax.jit(fn)
        return self._fn_cache[key]

    def video_block_fn(self, filt: np.ndarray):
        """Jitted scorer for a block of video frames.

        Takes padded luminance sequences (B + fl - 1, H, W) for test and
        reference [+ gaze (B, 2)], applies the sustained/transient temporal
        filters and scores the B output frames.  Shapes are static per (B, fl);
        the caller caches per distinct block size.
        """
        key = ("video", filt.shape[1], self.foveated, self.heatmap, filt.tobytes())
        if key not in self._fn_cache:
            F_filt = jnp.asarray(filt)

            def fn(padded_t, padded_r, *maybe_gaze):
                Rt = temporal_ops.apply_temporal_filters(padded_t, F_filt)
                Rr = temporal_ops.apply_temporal_filters(padded_r, F_filt)
                # order: T-sust, R-sust, T-trans, R-trans (fvvdp.py:293)
                R = jnp.stack([Rt[:, 0], Rr[:, 0], Rt[:, 1], Rr[:, 1]], axis=1)
                gaze = maybe_gaze[0] if self.foveated else None
                return self.score_frames(R, gaze, temp_ch=2)

            self._fn_cache[key] = jax.jit(fn)
        return self._fn_cache[key]
