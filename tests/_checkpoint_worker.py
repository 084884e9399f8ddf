"""Scoring worker for the kill-resume e2e test (run as a subprocess).

Usage: python _checkpoint_worker.py <ckpt_path> [kill_after_fetches]

Scores a deterministic 12-frame clip with checkpoint_path enabled.  With
``kill_after_fetches`` > 0 the video source SIGKILLs its own process after
serving that many luminance blocks — a real, uncatchable mid-video death
(no atexit, no exception unwinding), which is the scenario checkpoint/resume
exists for.  Without it, scoring runs to completion and prints the final
JOD plus how many block fetches it needed (a resumed run needs fewer: the
already-scored prefix is skipped, not re-decoded)."""
import os
import signal
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["FVVDP_DISABLE_SCAN"] = "1"  # checkpointed runs stream

import numpy as np  # noqa: E402

from fovvideovdp_tpu import fvvdp  # noqa: E402
from fovvideovdp_tpu.video_source import fvvdp_video_source_array  # noqa: E402

CKPT = sys.argv[1]
KILL_AFTER = int(sys.argv[2]) if len(sys.argv) > 2 else 0


class SelfKillingSource(fvvdp_video_source_array):
    fetches = 0

    def get_luminance_block(self, pos, n):
        type(self).fetches += 1
        if KILL_AFTER and type(self).fetches > KILL_AFTER:
            os.kill(os.getpid(), signal.SIGKILL)  # real kill, no cleanup
        return super().get_luminance_block(pos, n)


def main():
    rng = np.random.RandomState(17)
    F, H, W = 12, 32, 48
    ref = (rng.rand(F, H, W, 3) * 255).astype(np.uint8)
    tst = np.clip(ref.astype(np.int16) + rng.randint(-20, 20, ref.shape),
                  0, 255).astype(np.uint8)
    fv = fvvdp(display_name="standard_fhd", block_frames=4)
    vs = SelfKillingSource(tst, ref, 30, dim_order="FHWC",
                           display_photometry=fv.display_photometry)
    Q, _ = fv.predict_video_source(vs, checkpoint_path=CKPT,
                                   checkpoint_every=1)
    print(f"FINAL_Q={Q:.8f}")
    print(f"FETCHES={SelfKillingSource.fetches}")


if __name__ == "__main__":
    main()
