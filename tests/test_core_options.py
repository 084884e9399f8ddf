"""Tests for the MATLAB-core ablation/research options."""
import numpy as np
import pytest

from fovvideovdp_tpu import fvvdp
from fovvideovdp_tpu.content_mapping import fvvdp_content_mapping_equirect


@pytest.fixture(scope="module")
def small_video():
    rng = np.random.RandomState(3)
    ref = (rng.rand(32, 48, 3, 5) * 255).astype(np.uint8)
    tst = np.clip(ref / 255.0 + rng.randn(*ref.shape) * 0.05, 0, 1)
    return (tst * 255).astype(np.uint8), ref


def _q(fv, tst, ref):
    Q, stats = fv.predict(tst, ref, dim_order="HWCF", frames_per_second=30)
    assert np.isfinite(Q)
    return Q, stats


def test_do_temporal_channels_off(small_video):
    tst, ref = small_video
    fv = fvvdp(display_name="standard_fhd", do_temporal_channels=False)
    Q, stats = _q(fv, tst, ref)
    # transient channel must be all zero in this ablation
    assert np.all(stats["Q_per_ch"][:, 1, :] == 0)
    Q_full, _ = _q(fvvdp(display_name="standard_fhd"), tst, ref)
    assert Q != Q_full


def test_ignore_boundary_pixels(small_video):
    tst, ref = small_video
    Q_a, _ = _q(fvvdp(display_name="standard_fhd"), tst, ref)
    Q_b, _ = _q(fvvdp(display_name="standard_fhd", ignore_boundary_pixels=True),
                tst, ref)
    # removing boundary error energy must not lower the quality score
    assert Q_b >= Q_a - 1e-5


def test_masking_model_ablations(small_video, monkeypatch):
    tst, ref = small_video
    for model in ["contrast_difference", "contrast_difference_perc_norm"]:
        fv = fvvdp(display_name="standard_fhd",
                   parameter_overrides={"masking_model": model})
        Q, _ = _q(fv, tst, ref)
        assert 0 <= Q <= 10


def test_local_adapt_variants(small_video):
    tst, ref = small_video
    qs = {}
    for la in ["gpyr", "gpyr0", "gpyr2", "simple", "global"]:
        fv = fvvdp(display_name="standard_fhd",
                   parameter_overrides={"local_adapt": la})
        Q, _ = _q(fv, tst, ref)
        qs[la] = Q
    # all produce sane, distinct-but-close scores
    vals = np.array(list(qs.values()))
    assert (vals > 0).all() and (vals <= 10).all()
    assert np.ptp(vals) < 4.0


def test_log_contrast_mode(small_video):
    tst, ref = small_video
    fv = fvvdp(display_name="standard_fhd",
               parameter_overrides={"contrast": "log"})
    Q, _ = _q(fv, tst, ref)
    assert 0 <= Q <= 10


def test_band_callback_invoked(small_video):
    tst, ref = small_video
    calls = []

    def cb(bb, n_bands, cc, T_f, R_f, N):
        calls.append((int(bb), int(cc), np.asarray(T_f).shape))

    fv = fvvdp(display_name="standard_fhd", band_callback=cb)
    _q(fv, tst, ref)
    assert len(calls) > 0
    bands_seen = {c[0] for c in calls}
    assert len(bands_seen) >= 2


def test_content_mapping_equirect(small_video):
    tst, ref = small_video
    cm = fvvdp_content_mapping_equirect(48, 32)
    fv = fvvdp(display_name="standard_fhd", foveated=True, content_mapping=cm)
    gaze = np.array([24, 16])
    Q, _ = fv.predict(tst, ref, dim_order="HWCF", frames_per_second=30,
                      fixation_point=gaze)
    assert np.isfinite(Q) and 0 <= Q <= 10
