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


# Platforms the Mosaic kernels lower on.  Deliberately an allowlist: a GPU
# backend would pass a blanket "not cpu" test and then fail to compile the
# TPU-only pltpu primitives — jnp is the portable fallback everywhere else.
# TPU PJRT plugins may register under their own platform name (e.g. the
# tunnelled 'axon' backend in the dev environment); device_kind still says
# TPU there, which the fallback check below catches.
_TPU_PLATFORMS = ("tpu", "axon")


def _is_tpu(platform: str) -> bool:
    return platform.lower() in _TPU_PLATFORMS


def use_pallas() -> bool:
    if _FORCED is not None:
        return _FORCED
    try:
        dev = jax.config.jax_default_device
        if dev is not None:  # an explicit default device pins the platform
            platform = getattr(dev, "platform", str(dev).split(":")[0])
            if _is_tpu(platform):
                return True
            return "tpu" in getattr(dev, "device_kind", "").lower()
        if _is_tpu(jax.default_backend()):
            return True
        d = jax.devices()[0]
        return "tpu" in getattr(d, "device_kind", "").lower()
    except Exception:
        return False
