"""Round-5 hardening (ADVICE r4): flat clamp inside the dynamic-window LUT
interpolator, safe FVVDP_MOV_TR/CB parsing, exception-chain cleanup in the
scan OOM handler, and fast-fail in _wait_for_device_memory on non-OOM
backend errors."""
import logging
import time

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# ADVICE r4 #1: table_interp_delta_dyn must clamp u internally (flat, not
# linear, extrapolation beyond the last knot — for any caller)
# ---------------------------------------------------------------------------

def test_dyn_interp_clamps_overhang_to_flat():
    """An UNclamped u > n_grid-1 must produce the table's last-knot value
    (flat extrapolation), matching the static form fed clamped u — in
    particular with an odd knot window, where the 2x-unrolled loop's
    overhang knot used to re-add the last delta (linear extrapolation)."""
    import jax.numpy as jnp

    from fovvideovdp_tpu.ops.pallas import score_math

    rng = np.random.RandomState(11)
    n_grid, n_rows = 9, 2
    rows = jnp.asarray(rng.randn(n_rows, n_grid).astype(np.float32))
    # whole tile beyond the grid; window = [n_grid-1, n_grid-1] (odd count 1)
    u_over = jnp.asarray(
        rng.uniform(n_grid - 0.5, n_grid + 3.0, (8, 128)).astype(np.float32))
    got = score_math.table_interp_delta_dyn(rows, u_over, n_grid, n_rows)
    for k in range(n_rows):
        np.testing.assert_allclose(
            np.asarray(got[k]),
            np.full((8, 128), float(rows[k, -1]), np.float32),
            rtol=1e-6, atol=1e-6,
            err_msg="u beyond the last knot must clamp flat to t[-1]")
    # mixed finite window straddling the boundary stays exact vs static+clamp
    u_mix = jnp.asarray(
        rng.uniform(n_grid - 2.2, n_grid + 1.5, (8, 128)).astype(np.float32))
    ref = score_math.table_interp_delta(
        [rows[k] for k in range(n_rows)],
        jnp.clip(u_mix, 0.0, float(n_grid - 1)), n_grid)
    got = score_math.table_interp_delta_dyn(rows, u_mix, n_grid, n_rows)
    for k in range(n_rows):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   rtol=1e-6, atol=1e-6)
    # below-grid side clamps flat too
    u_neg = jnp.asarray(
        rng.uniform(-3.0, -0.5, (8, 128)).astype(np.float32))
    got = score_math.table_interp_delta_dyn(rows, u_neg, n_grid, n_rows)
    for k in range(n_rows):
        np.testing.assert_allclose(
            np.asarray(got[k]),
            np.full((8, 128), float(rows[k, 0]), np.float32),
            rtol=1e-6, atol=1e-6)


def test_dyn_interp_nan_still_confined_after_clamp():
    """The internal clamp must not break NaN-lane containment."""
    import jax.numpy as jnp

    from fovvideovdp_tpu.ops.pallas import score_math

    rng = np.random.RandomState(5)
    rows = jnp.asarray(rng.randn(1, 16).astype(np.float32))
    u = jnp.asarray(rng.uniform(1.0, 14.0, (8, 128)).astype(np.float32))
    u = u.at[2, 9].set(np.nan)
    (out,) = score_math.table_interp_delta_dyn(rows, u, 16, 1)
    out = np.asarray(out)
    assert np.isnan(out[2, 9])
    mask = np.ones_like(out, dtype=bool)
    mask[2, 9] = False
    assert np.isfinite(out[mask]).all()


# ---------------------------------------------------------------------------
# ADVICE r4 #2: FVVDP_MOV_TR/CB — malformed values warn and fall back
# ---------------------------------------------------------------------------

def test_mov_tile_env_malformed_falls_back(monkeypatch, caplog):
    from fovvideovdp_tpu.ops.pallas.mov_score import _mov_tile_shape

    monkeypatch.delenv("FVVDP_MOV_TR", raising=False)
    monkeypatch.delenv("FVVDP_MOV_CB", raising=False)
    base = _mov_tile_shape(256, 512)

    monkeypatch.setenv("FVVDP_MOV_TR", "not-a-number")
    monkeypatch.setenv("FVVDP_MOV_CB", "12.5")
    with caplog.at_level(logging.WARNING):
        got = _mov_tile_shape(256, 512)
    assert got == base, "malformed env values must not change the tiling"
    msgs = [r.message for r in caplog.records]
    assert any("FVVDP_MOV_TR" in m for m in msgs)
    assert any("FVVDP_MOV_CB" in m for m in msgs)


def test_mov_tile_env_valid_still_applies(monkeypatch):
    from fovvideovdp_tpu.ops.pallas.mov_score import _mov_tile_shape

    monkeypatch.setenv("FVVDP_MOV_TR", "32")
    monkeypatch.setenv("FVVDP_MOV_CB", "256")
    assert _mov_tile_shape(256, 512) == (32, 256)


# ---------------------------------------------------------------------------
# ADVICE r4 #3: the scan OOM handler breaks __cause__/__context__ chains
# ---------------------------------------------------------------------------

def test_scan_oom_fallback_breaks_exception_chain(monkeypatch):
    """A chained RESOURCE_EXHAUSTED from the scan path must (a) fall back to
    streaming and (b) not keep the chained exceptions' frames alive (the
    frames reference chunk-scale buffers)."""
    import gc
    import weakref

    from fovvideovdp_tpu import fvvdp
    from fovvideovdp_tpu.video_source import fvvdp_video_source_array

    rng = np.random.RandomState(0)
    ref = rng.randint(0, 255, (48, 64, 3, 6), dtype=np.uint8)
    tst = np.clip(ref.astype(np.int16) + 9, 0, 255).astype(np.uint8)
    fv = fvvdp(display_name="standard_fhd")
    monkeypatch.delenv("FVVDP_DISABLE_SCAN", raising=False)
    monkeypatch.delenv("FVVDP_SCAN_MAX_BYTES", raising=False)
    monkeypatch.delenv("FVVDP_SCAN_HBM_CAP_BYTES", raising=False)

    class _Canary:
        pass

    witness = []

    def boom(*a, **k):
        canary = _Canary()          # held only by this frame
        witness.append(weakref.ref(canary))
        try:
            raise ValueError("inner failure while dispatching")
        except ValueError as inner:
            raise RuntimeError(
                "RESOURCE_EXHAUSTED: Ran out of memory in memory space hbm"
            ) from inner

    # make the scan body raise a *chained* OOM at its first dispatch
    import fovvideovdp_tpu.core as core_mod
    monkeypatch.setattr(core_mod.MetricCore, "video_scan_fn",
                        lambda self, *a, **k: boom)

    vs = fvvdp_video_source_array(tst, ref, 30, dim_order="HWCF",
                                  display_photometry=fv.display_photometry)
    Q, _ = fv.predict_video_source(vs)
    assert fv._exec_path == "stream"
    assert 0.0 < Q <= 10.0
    gc.collect()
    assert witness and witness[0]() is None, (
        "the chained exception's frames (holding chunk-scale buffers) must "
        "be released by the OOM handler")


# ---------------------------------------------------------------------------
# ADVICE r4 #4: _wait_for_device_memory fails fast on non-OOM errors
# ---------------------------------------------------------------------------

def test_wait_for_device_memory_fast_fail_on_non_oom(monkeypatch):
    import jax

    from fovvideovdp_tpu.fvvdp import fvvdp as fv_cls

    def dead_backend(*a, **k):
        raise RuntimeError("FAILED_PRECONDITION: backend disconnected")

    monkeypatch.setattr(jax, "device_put", dead_backend)
    t0 = time.monotonic()
    fv_cls._wait_for_device_memory(timeout_s=30.0)
    took = time.monotonic() - t0
    assert took < 2.0, (f"non-OOM backend error must not stall the fallback "
                        f"({took:.1f}s)")


def test_wait_for_device_memory_retries_oom(monkeypatch):
    import jax

    from fovvideovdp_tpu.fvvdp import fvvdp as fv_cls

    calls = []

    def oom_then_ok(*a, **k):
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")
        return np.zeros(8, np.float32)

    monkeypatch.setattr(jax, "device_put", oom_then_ok)
    fv_cls._wait_for_device_memory(timeout_s=10.0)
    assert len(calls) == 3, "OOM-shaped errors must be retried until clear"


# ---------------------------------------------------------------------------
# VERDICT r4 #1: shipped compile-cache seed syncs into the active cache dir
# ---------------------------------------------------------------------------

def test_seed_compile_cache_sync(tmp_path):
    """Entries from the packaged seed dir are linked/copied into the cache
    dir, existing entries are left alone, and non-entry files are skipped."""
    from fovvideovdp_tpu import _seed_compile_cache

    src = tmp_path / "seed"
    dst = tmp_path / "cache"
    src.mkdir()
    (src / "jit_fn-aaaa-cache").write_bytes(b"executable-one")
    (src / "jit_fn-bbbb-cache").write_bytes(b"executable-two")
    (src / "MANIFEST.json").write_text("{}")

    _seed_compile_cache(str(dst), src=str(src))
    assert (dst / "jit_fn-aaaa-cache").read_bytes() == b"executable-one"
    assert (dst / "jit_fn-bbbb-cache").read_bytes() == b"executable-two"
    assert not (dst / "MANIFEST.json").exists()

    # an existing (newer) entry must not be clobbered
    (dst / "jit_fn-aaaa-cache").write_bytes(b"already-present")
    _seed_compile_cache(str(dst), src=str(src))
    assert (dst / "jit_fn-aaaa-cache").read_bytes() == b"already-present"

    # a missing seed dir is a clean no-op
    _seed_compile_cache(str(dst), src=str(tmp_path / "nope"))


def test_seed_compile_cache_never_raises(tmp_path):
    """Seeding is an optimisation: an unwritable destination must not break
    package import."""
    import os

    from fovvideovdp_tpu import _seed_compile_cache

    src = tmp_path / "seed"
    src.mkdir()
    (src / "jit_fn-cccc-cache").write_bytes(b"x")
    ro = tmp_path / "ro"
    ro.mkdir()
    os.chmod(ro, 0o500)
    try:
        _seed_compile_cache(str(ro / "sub"), src=str(src))  # cannot mkdir
    finally:
        os.chmod(ro, 0o700)


# ---------------------------------------------------------------------------
# VERDICT r4 #2: fixed-gaze foveation auto-selects the moving kernel when
# the per-pixel CSF tables would strangle the block budget
# ---------------------------------------------------------------------------

def _fov_pair(F=10, H=32, W=48):
    rng = np.random.RandomState(3)
    ref = rng.randint(0, 255, (H, W, 3, F), dtype=np.uint8)
    tst = np.clip(ref.astype(np.int16) + rng.randint(-20, 20, ref.shape),
                  0, 255).astype(np.uint8)
    return tst, ref


def test_fixed_gaze_autoselects_moving_kernel(monkeypatch):
    """When tables would halve the block size and the moving kernel is
    available, a FIXED fixation point scores through the constant-gaze
    moving path — with the same JOD as the table path."""
    import fovvideovdp_tpu.core as core_mod
    from fovvideovdp_tpu import fvvdp

    tst, ref = _fov_pair()
    fix = np.asarray([20.0, 12.0], np.float32)

    fv = fvvdp(display_name="standard_hmd", foveated=True)
    q_tables, _ = fv.predict(tst, ref, dim_order="HWCF",
                             frames_per_second=30, fixation_point=fix)

    seen = []
    orig = core_mod.MetricCore.video_scan_fn

    def spy(self, filt, B, k, static_gaze=None, log_contrast=False):
        seen.append(static_gaze)
        return orig(self, filt, B, k, static_gaze=static_gaze,
                    log_contrast=log_contrast)

    monkeypatch.setattr(core_mod.MetricCore, "video_scan_fn", spy)
    # huge tables + available kernel => the policy must switch
    monkeypatch.setattr(core_mod.MetricCore, "fov_table_bytes",
                        lambda self: 10 << 30)
    monkeypatch.setattr(core_mod.MetricCore, "mov_kernel_available",
                        lambda self: True)
    fv2 = fvvdp(display_name="standard_hmd", foveated=True)
    q_auto, _ = fv2.predict(tst, ref, dim_order="HWCF",
                            frames_per_second=30, fixation_point=fix)
    assert seen and all(g is None for g in seen), \
        "the scan must run WITHOUT static-gaze tables after the switch"
    np.testing.assert_allclose(q_auto, q_tables, rtol=1e-5, atol=1e-4)

    # opt-out env var keeps the table path
    seen.clear()
    monkeypatch.setenv("FVVDP_FOV_AUTOSELECT", "0")
    fv3 = fvvdp(display_name="standard_hmd", foveated=True)
    q_off, _ = fv3.predict(tst, ref, dim_order="HWCF",
                           frames_per_second=30, fixation_point=fix)
    assert seen and all(g is not None for g in seen), \
        "FVVDP_FOV_AUTOSELECT=0 must keep the per-pixel table path"
    np.testing.assert_allclose(q_off, q_tables, rtol=1e-6, atol=1e-6)


def test_fixed_gaze_keeps_tables_when_kernel_unavailable(monkeypatch):
    """No switch when the moving kernel can't serve the configuration —
    falling to the slow jnp moving path would be a pessimisation."""
    import fovvideovdp_tpu.core as core_mod
    from fovvideovdp_tpu import fvvdp

    tst, ref = _fov_pair()
    seen = []
    orig = core_mod.MetricCore.video_scan_fn

    def spy(self, filt, B, k, static_gaze=None, log_contrast=False):
        seen.append(static_gaze)
        return orig(self, filt, B, k, static_gaze=static_gaze,
                    log_contrast=log_contrast)

    monkeypatch.setattr(core_mod.MetricCore, "video_scan_fn", spy)
    monkeypatch.setattr(core_mod.MetricCore, "fov_table_bytes",
                        lambda self: 10 << 30)
    monkeypatch.setattr(core_mod.MetricCore, "mov_kernel_available",
                        lambda self: False)
    fv = fvvdp(display_name="standard_hmd", foveated=True)
    fv.predict(tst, ref, dim_order="HWCF", frames_per_second=30,
               fixation_point=np.asarray([20.0, 12.0], np.float32))
    assert seen and all(g is not None for g in seen)


def test_seed_compile_cache_env_opt_out(tmp_path, monkeypatch):
    """FVVDP_NO_SEED_CACHE=1 must make seeding a no-op (measurement tools
    rely on it for genuinely cold compile-cache dirs)."""
    from fovvideovdp_tpu import _seed_compile_cache

    src = tmp_path / "seed"
    dst = tmp_path / "cache"
    src.mkdir()
    (src / "jit_fn-dddd-cache").write_bytes(b"x")
    monkeypatch.setenv("FVVDP_NO_SEED_CACHE", "1")
    _seed_compile_cache(str(dst), src=str(src))
    assert not dst.exists() or not any(dst.iterdir())
    monkeypatch.delenv("FVVDP_NO_SEED_CACHE")
    _seed_compile_cache(str(dst), src=str(src))
    assert (dst / "jit_fn-dddd-cache").exists()
