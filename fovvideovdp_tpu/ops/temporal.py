"""Temporal channel decomposition: sustained / transient filters and the
blockwise (batched-over-frames) temporal convolution.

The reference maintains a per-frame sliding window on the GPU and re-does the
full O(filter_len) weighted sum for every output frame from Python
(pyfvvdp/fvvdp.py:248-300).  Here the temporal filter is applied to a whole
block of frames in one fused XLA program: the padded frame sequence is a
(F + fl - 1, H, W) array and each filter tap contributes one shifted slice —
removing the per-frame dispatch entirely and letting XLA pipeline the
multiply-adds with the downstream pyramid.
"""
from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np


def filter_len_for_fps(fps: float) -> int:
    """250 ms of video, rounded up (pyfvvdp/fvvdp.py:228).

    Clamped to >= 2 taps: below 4 fps a 250 ms window holds a single frame,
    and the transient filter (a finite difference over the window) needs at
    least two taps — the reference crashes there (t[1] on a 1-element axis);
    2 taps degrades gracefully to a one-step difference."""
    if fps <= 0:
        raise RuntimeError("frames_per_second must be positive for video")
    return max(2, int(np.ceil(250.0 / (1000.0 / fps))))


def temporal_filters(fps: float, filter_len: int, sustained_sigma: float = 0.5,
                     sustained_beta: float = 0.06) -> np.ndarray:
    """Sustained (log-Gaussian) and transient (scaled derivative) filters.

    Matches pyfvvdp/fvvdp.py:609-630 including its time-axis quirk: t spans
    [0, fl/fps] *inclusive* over fl points, so dt = fl/(fps*(fl-1)).
    Returns (2, filter_len) float32, F[0] sum-normalised.
    """
    t = np.linspace(0.0, filter_len / fps, filter_len)
    F = np.zeros((2, filter_len))
    F[0] = np.exp(-(np.log(t + 1e-4) - np.log(sustained_beta)) ** 2
                  / (2.0 * sustained_sigma ** 2))
    F[0] = F[0] / np.sum(F[0])

    k2 = 0.062170507756932
    Fdiff = F[0, 1:] - F[0, :-1]
    F[1] = k2 * np.concatenate([Fdiff / (t[1] - t[0]), [0.0]])
    return F.astype(np.float32)


def padding_indices(n_frames: int, filter_len: int, mode: str) -> np.ndarray:
    """Frame indices of the padded sequence (length n_frames + filter_len - 1)
    whose sliding fl-windows replicate the reference's warm-up buffers
    (pyfvvdp/fvvdp.py:258-285) for each temporal padding mode.

    The 'circular' mode reproduces the reference's off-by-one: frame 0's
    window is frames [(N-1-fl) .. (N-2)] mod N — frame 0 itself is absent.
    """
    fl, N = filter_len, n_frames
    if mode == "replicate":
        idx = [0] * (fl - 1) + list(range(N))
    elif mode == "circular":
        idx = [(N - 1 - fl + kk) % N for kk in range(fl)] + list(range(1, N))
    elif mode == "pingpong":
        pingpong = list(range(N)) + list(range(N - 2, 0, -1))
        ind: List[int] = []
        while len(ind) < fl - 1:
            ind = ind + pingpong
        idx = ind[-(fl - 1):] + [0] + list(range(1, N))
    else:
        raise RuntimeError(f'Unknown padding method "{mode}"')
    return np.asarray(idx, dtype=np.int32)


def apply_temporal_filters(padded: jnp.ndarray, F: jnp.ndarray) -> jnp.ndarray:
    """Causal temporal filtering of a padded frame sequence.

    padded: (F_out + fl - 1, ...) frames; F: (n_ch, fl) filters.
    Returns (F_out, n_ch, ...): out[f, c] = sum_j F[c, j] * padded[f + fl-1 - j].

    This is the portable jnp formulation (shifted-slice multiply-adds) and
    the gradient rule; the hot path goes through :func:`temporal_channels`,
    which fuses both streams into one VMEM-resident Pallas kernel.  (A
    matmul against a banded tap matrix was tried and is SLOWER: fp32 MXU
    matmuls decompose into multiple bf16 passes, re-reading the frame block
    from HBM each pass.)
    """
    fl = F.shape[1]
    n_out = padded.shape[0] - fl + 1
    outs = []
    for c in range(F.shape[0]):
        acc = None
        for j in range(fl):
            term = F[c, j] * padded[fl - 1 - j: fl - 1 - j + n_out]
            acc = term if acc is None else acc + term
        outs.append(acc)
    return jnp.stack(outs, axis=1)


# One row-tile of the pair kernel must fit in VMEM alongside its outputs;
# past this estimate the block splits over output frames (tests shrink it
# to exercise the split on small shapes).  The kernel raises Mosaic's VMEM
# cap to 100 MB (ops/pallas/temporal.py:_VMEM_LIMIT), so only very large
# frame blocks (> ~55 output frames at 4K) split; staying unchunked avoids
# re-reading the fl-1 overlap frames per chunk (19.4 -> 12.5 ms at 4K B=12).
_VMEM_SPLIT_BYTES = 88 << 20


def temporal_channels_pair_chunks(carry_t: jnp.ndarray, new_t: jnp.ndarray,
                                  carry_r: jnp.ndarray, new_r: jnp.ndarray,
                                  F: np.ndarray) -> list:
    """Like :func:`temporal_channels_pair`, but returns the output as a LIST
    of frame-axis chunks (in order) instead of one array.

    Big frame blocks split into several Pallas kernel calls (the kernel
    keeps a whole row tile's outputs in VMEM, see below); concatenating the
    chunk outputs is a multi-GB HBM copy per 4K block that the caller can
    avoid entirely, because frames are a pure batch dimension downstream —
    score each chunk and concatenate only the per-frame partials.
    """
    from fovvideovdp_tpu.ops import pallas as pallas_cfg
    F = np.asarray(F, dtype=np.float32)
    fl = F.shape[1]
    ncarry = carry_t.shape[0]
    n_new = new_t.shape[0]
    n_out = ncarry + n_new - fl + 1
    if (pallas_cfg.use_pallas() and carry_t.ndim == 3 and ncarry >= 1
            and carry_t.dtype == jnp.float32 and F.shape[0] == 2
            and n_out >= 1):
        from fovvideovdp_tpu.ops.pallas.temporal import (
            temporal_channels_pair_pallas)
        Wp = -(-carry_t.shape[2] // 128) * 128
        bytes_tile8 = (2 * (ncarry + n_new) + 4 * n_out) * Wp * 4 * 8 * 2
        if bytes_tile8 > _VMEM_SPLIT_BYTES and n_out > 1:
            # split over output frames (windows overlap by fl - 1); each
            # half's carry is a pure slice when the split point clears the
            # window, else a small (fl-1)-frame concat
            half = n_out // 2
            a = temporal_channels_pair_chunks(carry_t, new_t[:half], carry_r,
                                              new_r[:half], F)
            if half >= fl - 1:
                c_t2, c_r2 = new_t[half - (fl - 1):half], \
                    new_r[half - (fl - 1):half]
            else:
                c_t2 = jnp.concatenate([carry_t, new_t[:half]],
                                       axis=0)[-(fl - 1):]
                c_r2 = jnp.concatenate([carry_r, new_r[:half]],
                                       axis=0)[-(fl - 1):]
            b = temporal_channels_pair_chunks(c_t2, new_t[half:], c_r2,
                                              new_r[half:], F)
            return a + b
        return [temporal_channels_pair_pallas(carry_t, new_t, carry_r, new_r,
                                              F)]
    return [temporal_channels(jnp.concatenate([carry_t, new_t], axis=0),
                              jnp.concatenate([carry_r, new_r], axis=0), F)]


def temporal_channels_pair(carry_t: jnp.ndarray, new_t: jnp.ndarray,
                           carry_r: jnp.ndarray, new_r: jnp.ndarray,
                           F: np.ndarray) -> jnp.ndarray:
    """:func:`temporal_channels` with the padded window supplied in two
    pieces: the fl-1 carried frames and the fresh block.  On TPU the Pallas
    kernel reads both pieces directly, so the streaming step never
    materialises their concatenation in HBM (2 x ~460 MB of pure copy per
    4K block); elsewhere it concatenates and falls back.
    """
    chunks = temporal_channels_pair_chunks(carry_t, new_t, carry_r, new_r, F)
    return chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=0)


def temporal_channels(padded_t: jnp.ndarray, padded_r: jnp.ndarray,
                      F: np.ndarray) -> jnp.ndarray:
    """Temporal channels for a test/reference pair in one pass.

    padded_t/padded_r: (F_out + fl - 1, H, W); F: (2, fl) numpy filters.
    Returns (F_out, 4, H, W) ordered [T-sust, R-sust, T-trans, R-trans]
    (pyfvvdp/fvvdp.py:293).  On TPU both streams and all taps run in one
    VMEM-resident Pallas kernel (each input tile is read from HBM exactly
    once); elsewhere it falls back to the jnp formulation above.
    """
    from fovvideovdp_tpu.ops import pallas as pallas_cfg
    F = np.asarray(F, dtype=np.float32)
    if (pallas_cfg.use_pallas() and padded_t.ndim == 3
            and padded_t.dtype == jnp.float32 and F.shape[0] == 2
            and padded_t.shape[0] > F.shape[1] - 1):
        from fovvideovdp_tpu.ops.pallas.temporal import temporal_channels_pallas
        fl = F.shape[1]
        n_out = padded_t.shape[0] - fl + 1
        # The kernel keeps all n_out outputs of a row tile in VMEM; for very
        # large frame blocks even the minimum 8-row tile double-buffered
        # exceeds the raised VMEM cap (same budget as the pair path).  Split
        # the block (windows overlap by fl - 1 frames, so the only cost is
        # re-reading those rows).
        Wp = -(-padded_t.shape[2] // 128) * 128
        bytes_tile8 = (2 * padded_t.shape[0] + 4 * n_out) * Wp * 4 * 8 * 2
        if bytes_tile8 > _VMEM_SPLIT_BYTES and n_out > 1:
            half = n_out // 2
            a = temporal_channels(padded_t[:half + fl - 1],
                                  padded_r[:half + fl - 1], F)
            b = temporal_channels(padded_t[half:], padded_r[half:], F)
            return jnp.concatenate([a, b], axis=0)
        return temporal_channels_pallas(padded_t, padded_r, F)
    Rt = apply_temporal_filters(padded_t, jnp.asarray(F))
    Rr = apply_temporal_filters(padded_r, jnp.asarray(F))
    return jnp.stack([Rt[:, 0], Rr[:, 0], Rt[:, 1], Rr[:, 1]], axis=1)
