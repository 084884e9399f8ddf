"""fovvideovdp_tpu — TPU-native (JAX/XLA/Pallas) full-reference foveated
video/image quality metric with the capabilities of FovVideoVDP.

Public API mirrors the reference package (pyfvvdp/__init__.py) so existing
user code ports with an import change.
"""

import os as _os


def _seed_compile_cache(dst: str, src: str = None) -> None:
    """Populate ``dst`` with the compile-cache entries shipped in
    ``data/xla_seed_cache/`` (hardlink, falling back to copy).

    The benchmark-critical XLA programs take minutes to compile (through a
    remote-compile tunnel, with minute-scale variance); the persistent-cache
    keys are deterministic, so shipping the serialized executables makes a
    COLD environment's first call as fast as a warm one (measured: 989 s ->
    26-43 s to the first 4K video JOD).  The shipped seed is ~81 MB (see
    MANIFEST.json): ~10 MB covers the bench programs, the rest is the
    foveated/moving-gaze grid kernels whose cold compiles cost the most —
    a deliberate size/latency trade recorded there.  Entries are
    content-addressed by jax's own cache key — entries for a different
    backend/jaxlib/code version are simply never requested, so stale seeds
    are dead weight, not a correctness risk.  Regenerate with
    tools/seed_cache.py after kernel changes (it replaces, not appends).
    Set FVVDP_NO_SEED_CACHE=1 to skip seeding — measurement tools that
    need genuinely cold compiles (tools/seed_cache.py,
    tools/probe_mov_tr.py) set it for their subprocesses.
    """
    if _os.environ.get("FVVDP_NO_SEED_CACHE", "") == "1":
        return
    if src is None:
        src = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                            "data", "xla_seed_cache")
    if not _os.path.isdir(src):
        return
    try:
        _os.makedirs(dst, exist_ok=True)
        for name in _os.listdir(src):
            if not name.endswith("-cache"):
                continue
            d = _os.path.join(dst, name)
            if _os.path.exists(d):
                continue
            s = _os.path.join(src, name)
            try:
                _os.link(s, d)
            except OSError:
                import shutil as _shutil
                _shutil.copyfile(s, d + ".tmp")
                _os.replace(d + ".tmp", d)
    except Exception:
        pass  # seeding is an optimisation; never break import over it


# Persistent XLA compilation cache: metric programs are large (minutes to
# compile) but perfectly cacheable; this makes warm-up across processes
# near-instant. Opt out by setting JAX_COMPILATION_CACHE_DIR="".
if _os.environ.get("JAX_COMPILATION_CACHE_DIR", None) != "":
    import jax as _jax
    try:
        _cache_dir = _jax.config.jax_compilation_cache_dir
        if _cache_dir is None and "JAX_COMPILATION_CACHE_DIR" in _os.environ:
            # this jax version's config does NOT read the env var; honour it
            _cache_dir = _os.environ["JAX_COMPILATION_CACHE_DIR"]
            _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        if _cache_dir is None:
            _cache_dir = _os.path.expanduser("~/.cache/jax")
            _jax.config.update("jax_compilation_cache_dir", _cache_dir)
            _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _seed_compile_cache(_cache_dir)
    except Exception:
        pass

if _os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    # Some environments force-register an accelerator plugin at interpreter
    # start, overriding the JAX_PLATFORMS read from the environment; honour
    # the user's explicit CPU request by re-pinning the config key.  (This
    # must NOT touch jax.devices() — importing the package before
    # jax.distributed.initialize() would otherwise lock in a single-process
    # backend.)
    import jax as _jax
    try:
        _jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

from fovvideovdp_tpu.fvvdp import fvvdp
from fovvideovdp_tpu.display_model import (
    fvvdp_display_photometry,
    fvvdp_display_photo_eotf,
    fvvdp_display_photo_absolute,
    fvvdp_display_photo_gog,
    fvvdp_display_geometry,
)
from fovvideovdp_tpu.video_source import (
    fvvdp_video_source,
    fvvdp_video_source_array,
    fvvdp_video_source_packed_array,
)
from fovvideovdp_tpu.pupsnr import pu_psnr
from fovvideovdp_tpu.io.images import load_image_as_array

__version__ = "0.1.0"

__all__ = [
    "fvvdp",
    "pu_psnr",
    "fvvdp_display_photometry",
    "fvvdp_display_photo_eotf",
    "fvvdp_display_photo_absolute",
    "fvvdp_display_photo_gog",
    "fvvdp_display_geometry",
    "fvvdp_video_source",
    "fvvdp_video_source_array",
    "fvvdp_video_source_packed_array",
    "load_image_as_array",
]
