"""MXU matmul helpers shared by the Pallas kernels.

Mosaic exposes only two matmul precisions: DEFAULT (one bf16 pass — ~1e-3
relative error, far above the metric's parity tolerance) and HIGHEST (full
fp32 contract, the slowest option).  ``dot3`` implements the classic
bf16x3 scheme in between: split both fp32 operands into bf16 hi+lo parts
and accumulate the three significant cross products in fp32, dropping only
the lo*lo term.  bf16xbf16 products are exact in the fp32 accumulator
(8-bit mantissas multiply into 16 bits < fp32's 24), so the result matches
the fp32 contract to ~2^-16 relative at roughly half the MXU passes
(measured -2.0 ms on the 4K level-0 fused scorer, -1.5 ms on the 4K
pyramid reduce).
"""
import jax.numpy as jnp


def split_bf16(x):
    """fp32 -> (hi, lo) bf16 pair with x ~= hi + lo."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def dot3(x, y):
    """fp32-accurate matmul as 3 bf16 MXU passes (drops the lo*lo term).

    Only valid under Mosaic, where the f32->bf16 converts are literal.  When
    the kernel runs through the Pallas interpreter it lowers to plain XLA,
    whose excess-precision pass folds the f32->bf16->f32 convert pairs — the
    ``lo`` parts become exact zeros and the sum degrades to a single bf16
    pass (~1e-3 relative error).  Interpret mode therefore takes the full
    fp32 contract instead (same numerics class, no Mosaic in the loop).
    """
    from fovvideovdp_tpu.ops import pallas as pallas_cfg
    if pallas_cfg.interpret_mode():
        import jax
        return jnp.dot(x, y, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    xh, xl = split_bf16(x)
    yh, yl = split_bf16(y)
    return (jnp.dot(xh, yh, preferred_element_type=jnp.float32)
            + jnp.dot(xl, yh, preferred_element_type=jnp.float32)
            + jnp.dot(xh, yl, preferred_element_type=jnp.float32))
