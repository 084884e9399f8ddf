"""Pallas TPU kernels for the hot pyramid ops.

Kernels are drop-in numerics-identical replacements for the jnp reference
implementations in ops/pyramid.py; ``use_pallas()`` gates them (on by default
on TPU, off elsewhere — the jnp path is the portable fallback and the
correctness oracle).

``set_interpret(True)`` runs every kernel through the Pallas interpreter
instead of Mosaic: combined with ``set_use_pallas(True)`` this lets the
multi-chip dryrun execute the *Pallas* code path on a CPU mesh — the same
pallas_call graph structure (shard_map + per-shard kernels) a real TPU mesh
would run, with only the kernel backend emulated."""
import contextlib

import jax

_FORCED = None
_INTERPRET = False


def set_use_pallas(flag):
    """Force-enable/disable the Pallas kernels (None = auto)."""
    global _FORCED
    _FORCED = flag


def set_interpret(flag: bool):
    """Run kernels through the Pallas interpreter (for CPU-mesh dryruns)."""
    global _INTERPRET
    _INTERPRET = bool(flag)


def interpret_mode() -> bool:
    return _INTERPRET


@contextlib.contextmanager
def forced(use: bool, interpret: bool = False):
    """Temporarily force the Pallas gate (and optionally interpret mode)."""
    global _FORCED, _INTERPRET
    prev_f, prev_i = _FORCED, _INTERPRET
    _FORCED, _INTERPRET = use, interpret
    try:
        yield
    finally:
        _FORCED, _INTERPRET = prev_f, prev_i


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
