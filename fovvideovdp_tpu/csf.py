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

import jax.numpy as jnp
import numpy as np

from fovvideovdp_tpu import utils
from fovvideovdp_tpu.ops.interp import interp3

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
