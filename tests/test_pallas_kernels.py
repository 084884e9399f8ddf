"""Pallas TPU kernels must match the jnp reference implementations.

These tests run on real TPU hardware; on CPU-only hosts they are skipped
(the jnp fallback is the path under test everywhere else in the suite).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp


def _tpu_device():
    try:
        devs = [d for d in jax.devices() if d.platform not in ("cpu",)]
    except Exception:
        devs = []
    if not devs:
        pytest.skip("no TPU device available")
    return devs[0]


@pytest.mark.parametrize("shape", [(2160, 3840), (67, 190), (270, 480)])
def test_pallas_reduce_matches_jnp(shape):
    dev = _tpu_device()
    from fovvideovdp_tpu.ops.pyramid import _gausspyr_reduce_jnp
    from fovvideovdp_tpu.ops.pallas.reduce import gausspyr_reduce_pallas, supports
    H, W = shape
    if not supports(H, W):
        pytest.skip("shape unsupported by the kernel")
    x = jax.device_put(
        jnp.asarray(np.random.RandomState(0).rand(2, H, W).astype(np.float32) * 100),
        dev)
    ref = np.asarray(jax.jit(_gausspyr_reduce_jnp)(x))
    got = np.asarray(jax.jit(gausspyr_reduce_pallas)(x))
    rel = np.abs(ref - got).max() / max(np.abs(ref).max(), 1.0)
    assert rel < 1e-6, f"rel err {rel}"


def test_pallas_dispatch_gradient():
    """The custom-VJP wrapper must produce the same gradient as the jnp path."""
    dev = _tpu_device()
    from fovvideovdp_tpu.ops import pallas as pallas_cfg
    from fovvideovdp_tpu.ops.pyramid import (gausspyr_reduce,
                                             _gausspyr_reduce_jnp)
    x = jax.device_put(
        jnp.asarray(np.random.RandomState(1).rand(1, 144, 256).astype(np.float32)),
        dev)
    pallas_cfg.set_use_pallas(True)
    try:
        g1 = jax.grad(lambda v: jnp.sum(gausspyr_reduce(v) ** 2))(x)
    finally:
        pallas_cfg.set_use_pallas(None)
    g2 = jax.grad(lambda v: jnp.sum(_gausspyr_reduce_jnp(v) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4,
                               atol=1e-5)
