"""Pallas TPU kernels for the hot pyramid ops.

Kernels are drop-in numerics-identical replacements for the jnp reference
implementations in ops/pyramid.py; ``use_pallas()`` gates them (on by default
on TPU, off elsewhere — the jnp path is the portable fallback and the
correctness oracle)."""
import jax

_FORCED = None


def set_use_pallas(flag):
    """Force-enable/disable the Pallas kernels (None = auto)."""
    global _FORCED
    _FORCED = flag


def use_pallas() -> bool:
    if _FORCED is not None:
        return _FORCED
    try:
        dev = jax.config.jax_default_device
        if dev is not None:  # an explicit default device pins the platform
            return dev.platform not in ("cpu",)
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False
