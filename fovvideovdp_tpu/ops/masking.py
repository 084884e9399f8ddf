"""Visual masking model and norm pooling.

Implements the calibrated 'min_mutual_masking_perc_norm2' model
(pyfvvdp/fvvdp.py:574-596) and the weighted p-norm pooling chain
(fvvdp.py:337-357,598-607) as pure jnp so XLA fuses the whole
normalise -> mask -> pool epilogue per band.
"""
from __future__ import annotations

import jax.numpy as jnp


def apply_masking_model(T, R, N_nCSF, p: float, q: float, mask_c: float,
                        pu_dilate: float = 0.0):
    """Masked visual difference D for one band/channel.

    T, R: test/reference contrast; N_nCSF: per-pixel contrast threshold (1/S).
    D = |T/N - R/N|^p / (1 + M_pu^q), clamped to 1e4, where the
    phase-uncertainty masking signal is
    M_pu = 10^mask_c * min(|T/N|, |R/N|) when ``pu_dilate`` is 0, and its
    Gaussian dilation 10^mask_c * imgaussfilt(min(...), pu_dilate) otherwise.
    The dilation branch follows matlab/fvvdp_core.m:546-552 (replicate
    padding, MATLAB imgaussfilt semantics) — the Python reference's branch
    is unreachable there (pyfvvdp/fvvdp.py:552 calls utils.imgaussfilt,
    which does not exist; only the ImGaussFilt class does).
    """
    T = T / N_nCSF
    R = R / N_nCSF
    M = jnp.minimum(jnp.abs(T), jnp.abs(R))
    if pu_dilate != 0.0:
        from fovvideovdp_tpu.utils import ImGaussFilt
        gf = ImGaussFilt(pu_dilate, pad_mode="edge")
        # M is (..., h, w); blur each leading slice as one conv batch
        M = gf.run(M.reshape((-1, 1) + M.shape[-2:])).reshape(M.shape)
    M_pu = jnp.power(10.0, mask_c) * M
    D = jnp.power(jnp.abs(T - R), p) / (1.0 + jnp.power(M_pu, q))
    return jnp.clip(D, None, 1e4)


def weber2log(W):
    """Weber contrast (B-A)/A -> log contrast log10(B/A)
    (pyfvvdp/fvvdp.py:539-548)."""
    return jnp.log10(1.0 + W)


def lp_norm(x, p: float, axis=0, normalize: bool = True, keepdims: bool = True):
    """(sum |x|^p)^(1/p), optionally normalised by N^(1/p) along `axis`
    (pyfvvdp/fvvdp.py:598-607)."""
    N = x.shape[axis] if normalize else 1.0
    s = jnp.sum(jnp.power(jnp.abs(x), p), axis=axis, keepdims=keepdims)
    return jnp.power(s, 1.0 / p) / (float(N) ** (1.0 / p))


def pool_to_jod(Q_per_ch, w_transient: float, beta_sch: float, beta_tch: float,
                beta_t: float, jod_a: float, log_jod_exp: float):
    """Band -> channel -> frame pooling and JOD regression
    (pyfvvdp/fvvdp.py:337-357).

    Q_per_ch: (n_bands, 2, n_frames).  Returns a scalar JOD.
    """
    w = jnp.array([1.0, w_transient], dtype=Q_per_ch.dtype)[None, :, None]
    Q_sc = lp_norm(Q_per_ch * w, beta_sch, axis=0, normalize=False)
    Q_tc = lp_norm(Q_sc, beta_tch, axis=1, normalize=False)
    Q = lp_norm(Q_tc, beta_t, axis=2, normalize=True)
    Q = jnp.squeeze(Q)

    sign = 1.0 if jod_a >= 0 else -1.0
    beta_jod = 10.0 ** log_jod_exp
    Q_jod = sign * jnp.power(abs(jod_a) ** (1.0 / beta_jod) * Q, beta_jod) + 10.0
    return Q_jod
