"""Score bench.py's synthetic 4K clip through the PyTorch REFERENCE and
print the JOD to pin as bench.GOLDEN_SYNTH_Q.

Every golden this repo gates on must originate from the reference
implementation, never from this repo's own output (a numerics bug in an
early round would otherwise be enshrined by its own gate).  This tool
reconstructs bench.py's exact deterministic clip (RandomState(0), 8 unique
4K frames tiled to 60) and drives the reference video path
(/root/reference/pyfvvdp/fvvdp.py:181-357) on CPU.

Slow (single core, torch CPU, 4K x 60 frames — expect >~1 h); run once and
pin the printed value.  ``--frames N --size WxH`` shrink the clip for smoke
runs (those variants are NOT the pinned golden).

Usage: python tools/gen_synth_golden.py [--frames 60] [--size 3840x2160]
"""
import argparse
import os
import sys
import time
import types

import numpy as np

REFERENCE = "/root/reference"

# stub decode-only deps the reference imports at module scope (same trick
# as tools/gen_goldens.py — no media decoding is exercised here)
for name in ["ffmpeg"]:
    if name not in sys.modules:
        sys.modules[name] = types.ModuleType(name)
try:
    import imageio.v2  # noqa: F401
except Exception:
    imageio = types.ModuleType("imageio")
    imageio.v2 = types.ModuleType("imageio.v2")
    sys.modules["imageio"] = imageio
    sys.modules["imageio.v2"] = imageio.v2

sys.path.insert(0, REFERENCE)


def synth_clip(H, W, n_frames):
    """bench.py's clip, bit-for-bit (bench.py:126-133)."""
    rng = np.random.RandomState(0)
    base = rng.randint(0, 255, size=(H, W, 1, 8), dtype=np.uint8)
    test = np.clip(base.astype(np.int16)
                   + rng.randint(-12, 12, size=base.shape),
                   0, 255).astype(np.uint8)
    reps = -(-n_frames // base.shape[-1])
    ref_v = np.ascontiguousarray(
        np.tile(base, (1, 1, 1, reps))[..., :n_frames])
    test_v = np.ascontiguousarray(
        np.tile(test, (1, 1, 1, reps))[..., :n_frames])
    return test_v, ref_v


def score_config5(n_frames):
    """Score the deterministic config-5 clip (tools/synth_media.py) through
    the reference's .yuv source + full-screen resize + threshold heatmap
    (/root/reference/pyfvvdp/video_source_yuv.py:238-302)."""
    import tempfile

    import torch
    from pyfvvdp.fvvdp import fvvdp

    # the reference package uses flat sibling imports internally
    sys.path.insert(0, os.path.join(REFERENCE, "pyfvvdp"))
    import pyfvvdp.video_source_yuv as rvy
    from pyfvvdp.video_source_yuv import fvvdp_video_source_yuv_file

    # reference bug: its yuv ctor's debug f-string eagerly reads
    # color_transfer/in_pix_fmt, attributes only the ffmpeg file source sets
    # (video_source_yuv.py:266 vs video_source_file.py:73-74) -> AttributeError
    # on ANY yuv input; give the reader the attributes it forgot
    _orig = rvy.YUVReader.__init__

    def _patched(self, fname):
        _orig(self, fname)
        self.color_transfer = "unknown"
        self.in_pix_fmt = f"yuv{self.chroma_ss}p" \
            + (f"{self.bit_depth}le" if self.bit_depth > 8 else "")

    rvy.YUVReader.__init__ = _patched

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from synth_media import write_config5_yuv_pair

    with tempfile.TemporaryDirectory(prefix="fvvdp_cfg5_") as tdir:
        tst, ref = write_config5_yuv_pair(tdir, n_frames)
        vs = fvvdp_video_source_yuv_file(
            tst, ref, display_photometry="standard_hdr_pq",
            full_screen_resize="bilinear", resize_resolution=[3840, 2160])
        fv = fvvdp(display_name="standard_hdr_pq", heatmap="threshold",
                   device=torch.device("cpu"))
        t0 = time.time()
        Q, _ = fv.predict_video_source(vs)
        dt = time.time() - t0
    exact = n_frames == 60
    print(f"reference config5 JOD {float(Q):.6f} for x{n_frames} frames "
          f"in {dt:.0f}s"
          + ("  <- pin as the grid's 3840x2160/f60/config5 golden" if exact
             else "  (smoke variant, NOT the pinned golden)"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--size", default="3840x2160", metavar="WxH")
    ap.add_argument("--config5", action="store_true",
                    help="score the BASELINE config-5 clip (1080p 10-bit PQ "
                         "BT.2020 yuv, resized to 4K, threshold heatmap) "
                         "instead of the plain synthetic clip")
    args = ap.parse_args()

    import torch
    torch.set_num_threads(max(1, os.cpu_count() or 1))
    if args.config5:
        return score_config5(args.frames)
    W, H = (int(v) for v in args.size.lower().split("x"))

    from pyfvvdp.fvvdp import fvvdp

    test_v, ref_v = synth_clip(H, W, args.frames)
    fv = fvvdp(display_name="standard_4k", heatmap=None,
               device=torch.device("cpu"))
    t0 = time.time()
    Q, _ = fv.predict(test_v, ref_v, dim_order="HWCF", frames_per_second=30)
    dt = time.time() - t0
    exact = (W, H, args.frames) == (3840, 2160, 60)
    print(f"reference JOD {float(Q):.6f} for {W}x{H} x{args.frames} "
          f"synthetic clip in {dt:.0f}s"
          + ("  <- pin as bench.GOLDEN_SYNTH_Q" if exact
             else "  (smoke variant, NOT the pinned golden)"))


if __name__ == "__main__":
    main()
