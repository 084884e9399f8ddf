"""The metric must be differentiable end-to-end (metric-as-loss training)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fovvideovdp_tpu import fvvdp


def test_traced_matches_streaming(goldens):
    g = goldens("image_path_gray_float")
    fv = fvvdp(display_name="standard_4k")
    Q_stream, _ = fv.predict(g["test"], g["ref"], dim_order="HW")
    Q_traced = float(fv.predict_traced(jnp.asarray(g["test"]),
                                       jnp.asarray(g["ref"]), dim_order="HW"))
    np.testing.assert_allclose(Q_traced, Q_stream, atol=1e-4)


def test_traced_video_matches_streaming(goldens):
    g = goldens("video_path_replicate")
    fv = fvvdp(display_name="standard_fhd")
    tst = g["test"].astype(np.float32) / 255.0
    ref = g["ref"].astype(np.float32) / 255.0
    Q_stream, _ = fv.predict(tst, ref, dim_order="HWCF",
                             frames_per_second=float(g["fps"]))
    Q_traced = float(fv.predict_traced(tst, ref, dim_order="HWCF",
                                       frames_per_second=float(g["fps"])))
    np.testing.assert_allclose(Q_traced, Q_stream, atol=1e-3)


def test_gradient_flows():
    rng = np.random.RandomState(0)
    ref = jnp.asarray(rng.rand(32, 48).astype(np.float32))
    tst = jnp.clip(ref + rng.randn(32, 48).astype(np.float32) * 0.05, 0, 1)

    fv = fvvdp(display_name="standard_4k")

    def loss_fn(x):
        return fv.loss(x, ref, dim_order="HW")

    val, grad = jax.value_and_grad(loss_fn)(tst)
    assert np.isfinite(float(val)) and 0 <= float(val) <= 10
    g = np.asarray(grad)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0, "gradient must be non-zero"
    # gradient descent step must reduce the loss
    tst2 = jnp.clip(tst - 0.5 * grad / (np.abs(g).max() + 1e-9) * 0.05, 0, 1)
    val2 = float(loss_fn(tst2))
    assert val2 < float(val)


def test_gradient_with_checkpointing():
    rng = np.random.RandomState(1)
    ref = jnp.asarray(rng.rand(24, 32, 6).astype(np.float32))
    tst = jnp.clip(ref + rng.randn(24, 32, 6).astype(np.float32) * 0.05, 0, 1)
    fv = fvvdp(display_name="standard_4k", use_checkpoints=True)
    grad = jax.grad(lambda x: fv.loss(x, ref, dim_order="HWF",
                                      frames_per_second=30))(tst)
    g = np.asarray(grad)
    assert np.isfinite(g).all() and np.abs(g).max() > 0
