"""Spatio-chromatic CSF self-consistency tests.

Port of the MATLAB unit test SCCSF.test_sensitivity_predictions
(matlab/utils/SCCSF.m:95-135): a binary search over stimulus amplitude must
find the same detection threshold that sensitivity() predicts analytically.
"""
import numpy as np
import pytest

from fovvideovdp_tpu import csf_generator as g


def _binary_search(fn, target, lo, hi, iters=40):
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        if fn(mid) < target:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


@pytest.mark.parametrize("Y_mean", [0.1, 1.0, 10.0, 100.0])
def test_threshold_matches_binary_search(Y_mean):
    rng = np.random.RandomState(int(Y_mean * 10))
    freq = 2.0
    area = 0.5 ** 2 * np.pi

    LMS_mean = g.xyz2lms2006(g.WHITEPOINT_D65 * Y_mean)
    LMS_delta = (rng.rand(3) * 2 - 1) * 0.01 * Y_mean

    _, LMS_delta_thr, _, _ = g.sccsf_sensitivity(
        freq, LMS_mean[None, :], LMS_delta[None, :], area)

    thr_s = (LMS_delta_thr[0] / LMS_delta)
    # predicted threshold offset preserves the colour direction
    assert np.abs(thr_s[0] - thr_s[1]) < 1e-4
    assert np.abs(thr_s[1] - thr_s[2]) < 1e-4

    # binary search on the normalised detection contrast C(scale) = 1
    def C_of(scale):
        _, C = g.sccsf_pdet(freq, LMS_mean[None, :],
                            (LMS_delta * scale)[None, :], area)
        return float(C[0])

    thr_bs = _binary_search(C_of, 1.0, 1e-3, 100.0)
    assert abs(thr_s[0] - thr_bs) < 1e-4


def test_pdet_half_at_threshold():
    LMS_mean = g.xyz2lms2006(g.WHITEPOINT_D65 * 10.0)
    _, LMS_delta_thr, _, _ = g.sccsf_sensitivity(
        4.0, LMS_mean[None, :], np.array([[0.01, 0.004, 0.0002]]), 1.0)
    P, C = g.sccsf_pdet(4.0, LMS_mean[None, :], LMS_delta_thr, 1.0)
    np.testing.assert_allclose(C[0], 1.0, rtol=1e-10)
    np.testing.assert_allclose(P[0], 0.5, rtol=1e-10)


def test_chromatic_mechanism_shapes():
    """Achromatic mechanism is band-pass in frequency; red-green is low-pass
    (SCCSF_ConeContrastMat.m:196-201 applies the low-pass clamp only to
    chromatic mechanisms)."""
    LMS_mean = g.xyz2lms2006(g.WHITEPOINT_D65 * 100.0)[None, :]
    area = np.pi
    freqs = [1.0, 4.0, 16.0, 32.0]
    S = {c: [float(g.sccsf_sensitivity_coldir(f, LMS_mean, c, area)[0])
             for f in freqs] for c in (1, 2, 3)}
    for c in (1, 2, 3):
        assert all(np.isfinite(v) and v > 0 for v in S[c])
    # achromatic: band-pass (peaks mid-frequency)
    assert S[1][1] > S[1][0] and S[1][1] > S[1][3]
    # red-green and violet-yellow: monotonically low-pass
    assert S[2] == sorted(S[2], reverse=True)
    assert S[3] == sorted(S[3], reverse=True)
