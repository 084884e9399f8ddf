"""PyTorch interop: the metric as a differentiable loss in torch training.

The reference implementation is torch-native and is used directly as a
training loss (its gradient checkpointing exists for exactly that,
pyfvvdp/fvvdp.py:302-304).  This module preserves that workflow for torch
users after the switch: :func:`fvvdp_torch_loss` returns a callable that
maps torch tensors to a torch scalar whose ``backward()`` delivers
d(loss)/d(test) — computed by ``jax.grad`` through the WHOLE jitted
pipeline (display model, pyramid, CSF LUT interpolation, masking, pooling).

Tensors cross the boundary via DLPack (zero-copy when both frameworks share
the device); inputs on devices JAX cannot import fall back to a host copy.
The jitted value-and-grad program is compiled once per input shape.
"""
from __future__ import annotations

import numpy as np


def _torch():
    try:
        import torch
    except ImportError as e:  # pragma: no cover - torch is an optional dep
        raise RuntimeError(
            "fovvideovdp_tpu.torch_interop needs the 'torch' package") from e
    return torch


def _to_jax(t):
    """torch tensor -> jax array on JAX's default device.

    DLPack import when possible, host copy otherwise.  The import COMMITS
    the array to the producer's device (a CPU torch tensor yields a
    committed CPU jax array, which would pin the whole jitted metric to the
    CPU backend on a TPU host), so the result is re-placed on the default
    device when the platforms differ — that transfer is needed anyway."""
    import jax
    import jax.numpy as jnp
    t = t.detach().contiguous().float()
    try:
        a = jnp.from_dlpack(t)
    except Exception:
        a = jnp.asarray(t.cpu().numpy())
    default = getattr(jax.config.jax_default_device, "platform", None) \
        or jax.devices()[0].platform
    if next(iter(a.devices())).platform != default:
        a = jax.device_put(a)
    return a


def _to_torch(x, like):
    """jax array -> torch tensor on ``like``'s device."""
    torch = _torch()
    try:
        out = torch.from_dlpack(x)
    except Exception:
        out = torch.from_numpy(np.asarray(x))
    return out.to(like.device, dtype=like.dtype)


class _Bridge:
    """Holds the jitted value-and-grad program for one metric config."""

    def __init__(self, fv, dim_order, frames_per_second, fixation_point,
                 grad_ref):
        import jax
        self.grad_ref = grad_ref

        def loss(test, ref):
            return fv.loss(test, ref, dim_order=dim_order,
                           frames_per_second=frames_per_second,
                           fixation_point=fixation_point)

        argnums = (0, 1) if grad_ref else 0
        self.value_and_grad = jax.jit(jax.value_and_grad(loss, argnums=argnums))
        # value-only program for eval calls (no_grad / non-leaf inputs):
        # skips the whole backward pass and the gradient transfers
        self.value = jax.jit(loss)


def fvvdp_torch_loss(fv, dim_order="BCFHW", frames_per_second=0,
                     fixation_point=None, grad_ref=False):
    """Wrap an :class:`fovvideovdp_tpu.fvvdp` instance as a torch loss.

    Returns ``loss_fn(test, ref) -> torch scalar`` with
    ``loss = 10 - Q_JOD`` (0 when the pair is visually identical), fully
    differentiable w.r.t. ``test`` (and ``ref`` too when ``grad_ref=True``).
    Inputs are display-encoded float tensors in the layout named by
    ``dim_order`` (luminance when the photometry is absolute), exactly as
    :meth:`fvvdp.predict_traced`.

    Example::

        fv = fvvdp(display_name="standard_4k")
        loss_fn = fvvdp_torch_loss(fv, dim_order="HWC")
        loss = loss_fn(reconstruction, target)
        loss.backward()          # reconstruction.grad is populated
    """
    torch = _torch()
    bridge = _Bridge(fv, dim_order, frames_per_second, fixation_point,
                     grad_ref)

    class _LossFn(torch.autograd.Function):
        @staticmethod
        def forward(ctx, test, ref):
            val, grads = bridge.value_and_grad(_to_jax(test), _to_jax(ref))
            if bridge.grad_ref:
                g_test, g_ref = grads
                ctx.save_for_backward(_to_torch(g_test, test),
                                      _to_torch(g_ref, ref))
            else:
                ctx.save_for_backward(_to_torch(grads, test))
            return torch.as_tensor(float(val), dtype=test.dtype,
                                   device=test.device)

        @staticmethod
        def backward(ctx, g):
            saved = ctx.saved_tensors
            g_test = saved[0] * g
            g_ref = saved[1] * g if bridge.grad_ref else None
            return g_test, g_ref

    def loss_fn(test, ref):
        # dispatch OUTSIDE the Function: grad-mode is always disabled inside
        # autograd.Function.forward, so the check cannot live there
        needs_grad = torch.is_grad_enabled() and (
            test.requires_grad or (bridge.grad_ref and ref.requires_grad))
        if needs_grad:
            return _LossFn.apply(test, ref)
        # eval path: value only — skips the backward pass + grad transfers
        val = bridge.value(_to_jax(test), _to_jax(ref))
        return torch.as_tensor(float(val), dtype=test.dtype,
                               device=test.device)

    return loss_fn
