"""End-to-end JOD parity ON REAL TPU HARDWARE (run with ``pytest -m tpu``).

The rest of the suite is pinned to CPU (tests/conftest.py), where the Pallas
kernels are replaced by the jnp fallback; these tests score content on the
actual chip with the fused band_score / pyramid kernels engaged, so a
TPU-only numerics regression in the fused path is caught by the suite rather
than only by manual runs.  They self-skip when no TPU is present (e.g. the
default CPU-pinned suite run).
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.tpu

WAVY = "/root/reference/example_media/wavy_facade.png"


def _require_tpu():
    import jax
    try:
        devs = [d for d in jax.devices() if d.platform not in ("cpu",)]
    except Exception:
        devs = []
    if not devs:
        pytest.skip("no TPU device available (CPU-pinned run)")
    import jax as _jax
    dflt = _jax.config.jax_default_device
    if dflt is not None and dflt.platform == "cpu":
        pytest.skip("default device pinned to CPU")


def _pallas_engaged():
    from fovvideovdp_tpu.ops import pallas as pallas_cfg
    return pallas_cfg.use_pallas()


def test_pallas_gate_on_tpu():
    _require_tpu()
    assert _pallas_engaged(), "Pallas kernels must auto-enable on TPU"


@pytest.mark.skipif(not os.path.isfile(WAVY), reason="reference media absent")
def test_wavy_facade_published_goldens():
    """The two README-published JODs (README.md:137-138) on the real chip."""
    _require_tpu()
    from scipy.ndimage import gaussian_filter

    import fovvideovdp_tpu as fv_tpu

    I = fv_tpu.load_image_as_array(WAVY)
    assert I.dtype == np.uint16, "16-bit PNG must not be downconverted"
    rng = np.random.RandomState(42)
    noise = (np.clip(I / 65535.0 + rng.randn(*I.shape) * np.sqrt(0.003),
                     0, 1) * 65535).astype(np.uint16)
    blur = np.stack([gaussian_filter(I[:, :, c].astype(np.float32), 2,
                                     mode="nearest", truncate=2.0)
                     for c in range(3)], -1).astype(np.uint16)

    fv = fv_tpu.fvvdp(display_name="standard_4k")
    Q_noise, _ = fv.predict(noise, I, dim_order="HWC")
    Q_blur, _ = fv.predict(blur, I, dim_order="HWC")
    assert abs(Q_noise - 9.537) <= 0.01, Q_noise
    assert abs(Q_blur - 8.693) <= 0.01, Q_blur


def _cpu_reference_jod(tst, ref, **kw):
    """Score the same pair with the jnp path on the host CPU device."""
    import jax

    from fovvideovdp_tpu import fvvdp
    from fovvideovdp_tpu.ops import pallas as pallas_cfg

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu), pallas_cfg.forced(False):
        Q, _ = fvvdp(display_name="standard_fhd").predict(tst, ref, **kw)
    return Q


def test_image_tpu_matches_cpu_at_fused_size():
    """TPU (Pallas fused) vs CPU (jnp) at a size where every band >= 128 wide
    runs through band_score."""
    _require_tpu()
    from fovvideovdp_tpu import fvvdp

    rng = np.random.RandomState(0)
    ref = (rng.rand(270, 480, 3) * 255).astype(np.uint8)
    tst = np.clip(ref.astype(np.int16) + rng.randint(-15, 15, ref.shape),
                  0, 255).astype(np.uint8)
    Q_tpu, _ = fvvdp(display_name="standard_fhd").predict(tst, ref,
                                                          dim_order="HWC")
    Q_cpu = _cpu_reference_jod(tst, ref, dim_order="HWC")
    assert abs(Q_tpu - Q_cpu) <= 0.01, (Q_tpu, Q_cpu)


def test_video_tpu_matches_cpu():
    _require_tpu()
    from fovvideovdp_tpu import fvvdp

    rng = np.random.RandomState(1)
    ref = (rng.rand(270, 480, 3, 8) * 255).astype(np.uint8)
    tst = np.clip(ref.astype(np.int16) + rng.randint(-12, 12, ref.shape),
                  0, 255).astype(np.uint8)
    kw = dict(dim_order="HWCF", frames_per_second=30)
    Q_tpu, stats = fvvdp(display_name="standard_fhd").predict(tst, ref, **kw)
    Q_cpu = _cpu_reference_jod(tst, ref, **kw)
    assert abs(Q_tpu - Q_cpu) <= 0.01, (Q_tpu, Q_cpu)
    assert stats["Q_per_ch"].shape[2] == 8


def test_golden_fixture_on_tpu(goldens):
    """A stored torch-reference golden scored on the chip (jnp-size bands)."""
    _require_tpu()
    from fovvideovdp_tpu import fvvdp

    g = goldens("image_path_uint8")
    fv = fvvdp(display_name="standard_4k")
    Q, _ = fv.predict(g["test"], g["ref"], dim_order="HWC")
    assert abs(Q - float(g["Q_jod"])) <= 0.01, (Q, float(g["Q_jod"]))


def test_foveated_tpu_matches_cpu():
    """Foveated parity on hardware for BOTH CSF paths: the fixed-gaze
    per-pixel tables and the moving-gaze block trilinear.  These run through
    einsum/one-hot contractions against the S_log LUT, which on TPU need the
    explicit full-precision override in csf.py (single-pass bf16 rounds
    S_log by ~0.05 — a ~3.5% sensitivity error)."""
    _require_tpu()
    import jax

    from fovvideovdp_tpu import fvvdp
    from fovvideovdp_tpu.ops import pallas as pallas_cfg

    rng = np.random.RandomState(4)
    ref = (rng.rand(200, 320, 3, 6) * 255).astype(np.uint8)
    tst = np.clip(ref.astype(np.int16) + rng.randint(-14, 14, ref.shape),
                  0, 255).astype(np.uint8)
    gaze = np.stack([np.linspace(20, 300, 6), np.linspace(20, 180, 6)]).T
    kw = dict(dim_order="HWCF", frames_per_second=30)

    for label, fix in [("fixed", None), ("moving", gaze)]:
        fv = fvvdp(display_name="htc_vive_pro", foveated=True)
        Q_tpu, _ = fv.predict(tst, ref, fixation_point=fix, **kw)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu), pallas_cfg.forced(False):
            fv_c = fvvdp(display_name="htc_vive_pro", foveated=True)
            Q_cpu, _ = fv_c.predict(tst, ref, fixation_point=fix, **kw)
        assert abs(Q_tpu - Q_cpu) <= 0.01, (label, Q_tpu, Q_cpu)
