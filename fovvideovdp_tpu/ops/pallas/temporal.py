"""Fused temporal-channel filtering (Pallas TPU kernel).

Computes the sustained + transient temporal responses of BOTH the test and
reference streams in one VMEM pass:

    out[f, 0] = sum_j F[0, j] * t[f + fl-1 - j]     (test, sustained)
    out[f, 1] = sum_j F[0, j] * r[f + fl-1 - j]     (reference, sustained)
    out[f, 2] = sum_j F[1, j] * t[f + fl-1 - j]     (test, transient)
    out[f, 3] = sum_j F[1, j] * r[f + fl-1 - j]     (reference, transient)

The windows of consecutive output frames overlap by fl-1 frames, so the XLA
shifted-slice formulation re-reads the (F_in, H, W) block from HBM once per
tap; here each input row tile is DMA'd into VMEM exactly once and all
F_out x 4 outputs are produced from it with unrolled multiply-adds on the
VPU.  Filter taps are trace-time constants baked into the kernel.

Reference semantics: pyfvvdp/fvvdp.py:294-300 (the per-frame sliding-window
sum), blockwise as in ops/temporal.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fovvideovdp_tpu.ops.pyramid import ceildiv

_VMEM_BUDGET = 8 << 20  # input+output tile bytes per program
# Mosaic's default VMEM cap rejects the TR=8 tile of a full 4K frame block
# past ~B=12; raising it keeps big blocks in ONE kernel call (v5e has 128 MB
# of VMEM).  Splitting instead costs ~55% more HBM traffic re-reading the
# fl-1 overlap frames per chunk: measured 19.4 -> 12.5 ms per 4K B=12 block.
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 << 20)


def _accumulate_taps(read_pair, out_ref, *, taps, n_out):
    """Shared tap-accumulation loop: frame indices are unrolled Python ints,
    so ``read_pair(src)`` reads each tap from a statically-known ref."""
    fl = len(taps[0])
    for f in range(n_out):
        for c in range(2):
            acc_t = None
            acc_r = None
            for j in range(fl):
                w = taps[c][j]
                if w == 0.0:
                    continue
                tt, rr = read_pair(f + fl - 1 - j)
                acc_t = w * tt if acc_t is None else acc_t + w * tt
                acc_r = w * rr if acc_r is None else acc_r + w * rr
            out_ref[f, 2 * c] = acc_t
            out_ref[f, 2 * c + 1] = acc_r


def _temporal_kernel(t_ref, r_ref, out_ref, *, taps, n_out):
    _accumulate_taps(lambda src: (t_ref[src], r_ref[src]), out_ref,
                     taps=taps, n_out=n_out)


@functools.partial(jax.jit, static_argnames=("taps", "interpret"))
def _temporal_call(padded_t, padded_r, taps, interpret=False):
    n_in, H, W = padded_t.shape
    fl = len(taps[0])
    n_out = n_in - fl + 1

    Wp = ceildiv(W, 128) * 128
    # row-tile size bounded by the VMEM budget across in+out blocks
    bytes_per_row = (2 * n_in + 4 * n_out) * Wp * 4
    TR = max(8, min(256, ceildiv(H, 8) * 8,  # never exceed the frame
                    (_VMEM_BUDGET // max(bytes_per_row, 1)) // 8 * 8))
    n_tiles = ceildiv(H, TR)
    Hp = n_tiles * TR
    if Hp != H or Wp != W:
        pad = ((0, 0), (0, Hp - H), (0, Wp - W))
        padded_t = jnp.pad(padded_t, pad)
        padded_r = jnp.pad(padded_r, pad)

    out = pl.pallas_call(
        functools.partial(_temporal_kernel, taps=taps, n_out=n_out),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((n_in, TR, Wp), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_in, TR, Wp), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_out, 4, TR, Wp), lambda i: (0, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_out, 4, Hp, Wp), padded_t.dtype),
        compiler_params=None if interpret else _VMEM_LIMIT,
        interpret=interpret,
    )(padded_t, padded_r)
    return out[:, :, :H, :W]


def _temporal_kernel_pair(ct_ref, nt_ref, cr_ref, nr_ref, out_ref,
                          *, taps, n_out, ncarry):
    """Same as _temporal_kernel, but the frame window is supplied as two
    separate refs (the fl-1 carried frames + the B fresh frames) — the
    streaming step no longer materialises their 2x~460 MB concatenation in
    HBM.  Frame indices are unrolled Python ints, so each tap reads from a
    statically-known ref."""
    def read_pair(src):
        if src < ncarry:
            return ct_ref[src], cr_ref[src]
        return nt_ref[src - ncarry], nr_ref[src - ncarry]

    _accumulate_taps(read_pair, out_ref, taps=taps, n_out=n_out)


@functools.partial(jax.jit, static_argnames=("taps", "interpret"))
def _temporal_call_pair(carry_t, new_t, carry_r, new_r, taps,
                        interpret=False):
    ncarry, H, W = carry_t.shape
    n_new = new_t.shape[0]
    fl = len(taps[0])
    n_in = ncarry + n_new
    n_out = n_in - fl + 1

    Wp = ceildiv(W, 128) * 128
    bytes_per_row = (2 * n_in + 4 * n_out) * Wp * 4
    TR = max(8, min(256, ceildiv(H, 8) * 8,  # never exceed the frame
                    (_VMEM_BUDGET // max(bytes_per_row, 1)) // 8 * 8))
    n_tiles = ceildiv(H, TR)
    Hp = n_tiles * TR
    if Hp != H or Wp != W:
        pad = ((0, 0), (0, Hp - H), (0, Wp - W))
        carry_t, carry_r = jnp.pad(carry_t, pad), jnp.pad(carry_r, pad)
        new_t, new_r = jnp.pad(new_t, pad), jnp.pad(new_r, pad)

    def spec(n):
        return pl.BlockSpec((n, TR, Wp), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_temporal_kernel_pair, taps=taps, n_out=n_out,
                          ncarry=ncarry),
        grid=(n_tiles,),
        in_specs=[spec(ncarry), spec(n_new), spec(ncarry), spec(n_new)],
        out_specs=pl.BlockSpec((n_out, 4, TR, Wp), lambda i: (0, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_out, 4, Hp, Wp), new_t.dtype),
        compiler_params=None if interpret else _VMEM_LIMIT,
        interpret=interpret,
    )(carry_t, new_t, carry_r, new_r)
    return out[:, :, :H, :W]


def _temporal_pair_jnp(carry_t, new_t, carry_r, new_r, taps):
    return _temporal_jnp(jnp.concatenate([carry_t, new_t], axis=0),
                         jnp.concatenate([carry_r, new_r], axis=0), taps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _temporal_pair(carry_t, new_t, carry_r, new_r, taps):
    from fovvideovdp_tpu.ops import pallas as pallas_cfg
    return _temporal_call_pair(carry_t, new_t, carry_r, new_r, taps,
                               interpret=pallas_cfg.interpret_mode())


def _tp_fwd(carry_t, new_t, carry_r, new_r, taps):
    return _temporal_pair(carry_t, new_t, carry_r, new_r, taps), \
        (carry_t, new_t, carry_r, new_r)


def _tp_bwd(taps, res, g):
    carry_t, new_t, carry_r, new_r = res
    _, vjp = jax.vjp(lambda a, b, c, d: _temporal_pair_jnp(a, b, c, d, taps),
                     carry_t, new_t, carry_r, new_r)
    return vjp(g)


_temporal_pair.defvjp(_tp_fwd, _tp_bwd)


def temporal_channels_pair_pallas(carry_t, new_t, carry_r, new_r,
                                  F: np.ndarray):
    """Split-window variant of :func:`temporal_channels_pallas`: the fl-1
    carried frames and the fresh block are read directly, without the
    streaming step having to concatenate them in HBM first."""
    taps = tuple(tuple(float(x) for x in row) for row in np.asarray(F))
    return _temporal_pair(carry_t, new_t, carry_r, new_r, taps)


def _temporal_jnp(padded_t, padded_r, taps):
    from fovvideovdp_tpu.ops.temporal import apply_temporal_filters
    F = jnp.asarray(np.asarray(taps, dtype=np.float32))
    Rt = apply_temporal_filters(padded_t, F)
    Rr = apply_temporal_filters(padded_r, F)
    return jnp.stack([Rt[:, 0], Rr[:, 0], Rt[:, 1], Rr[:, 1]], axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _temporal(padded_t, padded_r, taps):
    from fovvideovdp_tpu.ops import pallas as pallas_cfg
    return _temporal_call(padded_t, padded_r, taps,
                          interpret=pallas_cfg.interpret_mode())


def _t_fwd(padded_t, padded_r, taps):
    return _temporal(padded_t, padded_r, taps), (padded_t, padded_r)


def _t_bwd(taps, res, g):
    padded_t, padded_r = res
    _, vjp = jax.vjp(lambda a, b: _temporal_jnp(a, b, taps),
                     padded_t, padded_r)
    return vjp(g)


_temporal.defvjp(_t_fwd, _t_bwd)


def temporal_channels_pallas(padded_t, padded_r, F: np.ndarray):
    """(F_in, H, W) x2 -> (F_out, 4, H, W) [T-sust, R-sust, T-trans, R-trans].

    Differentiable (jnp gradient rule); numerics match apply_temporal_filters
    up to summation association."""
    taps = tuple(tuple(float(x) for x in row) for row in np.asarray(F))
    return _temporal(padded_t, padded_r, taps)
