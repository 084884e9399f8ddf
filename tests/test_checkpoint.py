"""Checkpoint/resume of long-video streaming scoring.

The reference has no job checkpointing (SURVEY.md section 5); here a killed
scoring run resumes from the last saved block instead of re-decoding and
re-scoring from frame 0.  The checkpoint holds the drained Q_per_ch, the
stream position, and the filter_len-1 carry frames, guarded by a fingerprint
of the video/configuration.
"""
import os

import numpy as np
import pytest

from fovvideovdp_tpu import fvvdp
from fovvideovdp_tpu.video_source import fvvdp_video_source_array


class CrashingSource(fvvdp_video_source_array):
    """Raises after serving `limit` luminance blocks — a simulated kill."""

    def __init__(self, *a, limit=10**9, **kw):
        super().__init__(*a, **kw)
        self.limit = limit
        self.calls = 0
        self.positions = []

    def get_luminance_block(self, pos, n):
        self.calls += 1
        if self.calls > self.limit:
            raise RuntimeError("simulated crash")
        self.positions.append((int(pos), int(n)))
        return super().get_luminance_block(pos, n)

    def block_starts(self):
        # full blocks only (n > 1): the 1-frame fingerprint probe is not a
        # re-read of scored content
        return [p for p, n in self.positions if n > 1]


def _content():
    rng = np.random.RandomState(17)
    F, H, W = 12, 32, 48
    ref = (rng.rand(F, H, W, 3) * 255).astype(np.uint8)
    tst = np.clip(ref.astype(np.int16) + rng.randint(-20, 20, ref.shape),
                  0, 255).astype(np.uint8)
    return tst, ref


def test_resume_after_crash(tmp_path, monkeypatch):
    # checkpointed runs always stream; keep the uncheckpointed baseline on
    # the same path (the scan path re-fuses reductions, wiggling last bits)
    monkeypatch.setenv("FVVDP_DISABLE_SCAN", "1")
    tst, ref = _content()
    ckpt = str(tmp_path / "score.ckpt")
    fv = fvvdp(display_name="standard_fhd", block_frames=4)

    q_full, s_full = fv.predict(tst, ref, dim_order="FHWC",
                                frames_per_second=30)

    crashy = CrashingSource(tst, ref, 30, dim_order="FHWC",
                            display_photometry=fv.display_photometry,
                            limit=3)  # probe + 2 of the 3 blocks, then die
    with pytest.raises(RuntimeError, match="simulated crash"):
        fv.predict_video_source(crashy, checkpoint_path=ckpt,
                                checkpoint_every=1)
    assert os.path.isfile(ckpt), "crash must leave a checkpoint behind"

    resumed = CrashingSource(tst, ref, 30, dim_order="FHWC",
                             display_photometry=fv.display_photometry)
    q2, s2 = fv.predict_video_source(resumed, checkpoint_path=ckpt,
                                     checkpoint_every=1)
    np.testing.assert_allclose(q2, q_full, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(s2["Q_per_ch"], s_full["Q_per_ch"],
                               rtol=1e-5, atol=1e-6)
    # the resumed run must NOT have re-read the already-scored prefix
    assert min(resumed.block_starts()) >= 4
    assert not os.path.isfile(ckpt), "checkpoint is removed on completion"


def test_checkpoint_fingerprint_mismatch(tmp_path):
    tst, ref = _content()
    ckpt = str(tmp_path / "score.ckpt")
    fv = fvvdp(display_name="standard_fhd", block_frames=4)

    crashy = CrashingSource(tst, ref, 30, dim_order="FHWC",
                            display_photometry=fv.display_photometry,
                            limit=2)
    with pytest.raises(RuntimeError):
        fv.predict_video_source(crashy, checkpoint_path=ckpt,
                                checkpoint_every=1)
    assert os.path.isfile(ckpt)

    # different content length -> stale checkpoint must be ignored
    q_short, _ = fv.predict(tst[:8], ref[:8], dim_order="FHWC",
                            frames_per_second=30)
    vs = fvvdp_video_source_array(tst[:8], ref[:8], 30, dim_order="FHWC",
                                  display_photometry=fv.display_photometry)
    q2, _ = fv.predict_video_source(vs, checkpoint_path=ckpt)
    np.testing.assert_allclose(q2, q_short, rtol=1e-6, atol=1e-6)


def test_checkpoint_rejects_other_display(tmp_path):
    """Same geometry + frame count but a different display model: the
    luminance fingerprint probe must refuse the stale state (scoring under
    the new display from scratch, not mixing carried frames)."""
    tst, ref = _content()
    ckpt = str(tmp_path / "score.ckpt")
    fv = fvvdp(display_name="standard_fhd", block_frames=4)
    crashy = CrashingSource(tst, ref, 30, dim_order="FHWC",
                            display_photometry=fv.display_photometry,
                            limit=2)
    with pytest.raises(RuntimeError):
        fv.predict_video_source(crashy, checkpoint_path=ckpt,
                                checkpoint_every=1)
    assert os.path.isfile(ckpt)

    fv2 = fvvdp(display_name="standard_hdr_pq", block_frames=4)
    q_clean, _ = fv2.predict(tst, ref, dim_order="FHWC", frames_per_second=30)
    vs = fvvdp_video_source_array(tst, ref, 30, dim_order="FHWC",
                                  display_photometry=fv2.display_photometry)
    q2, _ = fv2.predict_video_source(vs, checkpoint_path=ckpt)
    np.testing.assert_allclose(q2, q_clean, rtol=1e-6, atol=1e-6)


def test_checkpoint_rejects_heatmap(tmp_path):
    tst, ref = _content()
    fv = fvvdp(display_name="standard_fhd", heatmap="raw")
    vs = fvvdp_video_source_array(tst, ref, 30, dim_order="FHWC",
                                  display_photometry=fv.display_photometry)
    with pytest.raises(RuntimeError, match="heatmap"):
        fv.predict_video_source(vs, checkpoint_path=str(tmp_path / "c"))


@pytest.mark.slow
def test_sigkill_and_resume_e2e(tmp_path):
    """The feature's whole point, end to end: a scoring PROCESS is SIGKILLed
    mid-video (no unwinding, no atexit — tests/_checkpoint_worker.py kills
    itself after 3 block fetches), then a rerun resumes from the on-disk
    checkpoint, skips the already-scored prefix, and lands on the same JOD
    as an uninterrupted run."""
    import subprocess
    import sys

    from conftest import cpu_subprocess_env
    env = cpu_subprocess_env()
    worker = os.path.join(os.path.dirname(__file__), "_checkpoint_worker.py")
    ckpt = str(tmp_path / "kill.ckpt")

    # 1. killed mid-video: exit by SIGKILL, checkpoint left behind
    r1 = subprocess.run([sys.executable, worker, ckpt, "3"],
                        capture_output=True, text=True, env=env, timeout=900)
    assert r1.returncode == -9, (r1.returncode, r1.stderr[-2000:])
    assert os.path.isfile(ckpt), "SIGKILL must leave the checkpoint on disk"

    # 2. rerun resumes and completes
    r2 = subprocess.run([sys.executable, worker, ckpt],
                        capture_output=True, text=True, env=env, timeout=900)
    assert r2.returncode == 0, r2.stderr[-2000:]
    out = dict(line.split("=") for line in r2.stdout.split()
               if "=" in line)
    assert not os.path.isfile(ckpt), "checkpoint is removed on completion"

    # 3. uninterrupted run for the ground-truth JOD (fresh ckpt path)
    r3 = subprocess.run([sys.executable, worker, str(tmp_path / "clean.ckpt")],
                        capture_output=True, text=True, env=env, timeout=900)
    assert r3.returncode == 0, r3.stderr[-2000:]
    ref_out = dict(line.split("=") for line in r3.stdout.split()
                   if "=" in line)
    assert abs(float(out["FINAL_Q"]) - float(ref_out["FINAL_Q"])) < 1e-6
    # the resumed run must have skipped the scored prefix: fewer fetches
    # (probe + remaining blocks) than the clean run (probe + all 3 blocks)
    assert int(out["FETCHES"]) < int(ref_out["FETCHES"])
