"""Long-video soak: stream a >=3,000-frame 4K synthetic video on the chip.

Nothing in rounds 1-4 ever scored more than ~60 frames in one call; this
drives the O(window) streaming claim (the reference's design goal,
pyfvvdp/fvvdp.py:248-300, never tested at this scale there either) at
production length on real hardware:

  stage 1  uninterrupted whole-video scoring (scan ladder reuse: the chunk
           rungs compile once and serve all ~100 blocks), recording
           sustained fps and the HBM high-water mark
  stage 2  the same video scored with --checkpoint in a SUBPROCESS that is
           SIGKILLed mid-run, then resumed; the resumed JOD must equal the
           uninterrupted JOD

The video pair is generated ON DEVICE (a base noise image scrolled per
frame; the test adds a luminance-dependent distortion), so no host decode
or 25 GB upload bounds the soak — the chip streams at compute speed and
the O(window) memory claim is what's actually under test.

Usage: python tools/soak.py [--frames 3000] [--size 3840x2160]
       (internal: --child --checkpoint PATH for the kill/resume stage)
"""
import argparse
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_source(H, W, n_frames, fps=30.0):
    import jax
    import jax.numpy as jnp

    from fovvideovdp_tpu.video_source import fvvdp_video_source

    rng = np.random.RandomState(1234)
    base = jnp.asarray(
        (rng.rand(H, W).astype(np.float32) ** 2) * 180.0 + 0.5)
    row_idx = jnp.arange(H, dtype=jnp.int32)

    @jax.jit
    def gen(idx):
        # reference: base scrolled 3 rows/frame (deterministic, device-side)
        def one(i):
            rows = (row_idx + 3 * i) % H
            L_r = base[rows]
            # test: frame-dependent contrast distortion + mid-tone banding
            L_t = L_r * (1.0 + 0.015 * jnp.sin(0.7 * i.astype(jnp.float32))) \
                + 0.8 * jnp.sin(L_r * 0.35 + i.astype(jnp.float32) * 0.11)
            return jnp.clip(L_t, 0.005, None), L_r
        return jax.vmap(one)(idx)

    class SyntheticSource(fvvdp_video_source):
        """Device-procedural absolute-luminance pair (no photometry)."""

        def get_video_size(self):
            return H, W, n_frames

        def get_frames_per_second(self):
            return fps

        def get_test_frame(self, frame, device=None):
            t, _ = gen(jnp.asarray([frame], jnp.int32))
            return t[None, None]

        def get_reference_frame(self, frame, device=None):
            _, r = gen(jnp.asarray([frame], jnp.int32))
            return r[None, None]

        def luminance_is_device_resident(self):
            return True

        def device_resident_bytes(self):
            return int(base.size * 4)

        def get_luminance_block(self, start, count):
            import jax.numpy as jnp
            return gen(jnp.arange(start, start + count, dtype=jnp.int32))

        def get_indexed_luminance_block(self, indices):
            import jax.numpy as jnp
            return gen(jnp.asarray(np.asarray(indices), jnp.int32))

    return SyntheticSource()


def hbm_stats():
    import jax
    try:
        st = jax.devices()[0].memory_stats() or {}
        return {k: int(v) for k, v in st.items()
                if k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")}
    except Exception:
        return {}


def run_child(args):
    """Checkpointed scoring run (killed externally in stage 2)."""
    from fovvideovdp_tpu import fvvdp
    vs = make_source(args.H, args.W, args.frames)
    fv = fvvdp(display_name="standard_4k", heatmap=None)
    Q, _ = fv.predict_video_source(vs, checkpoint_path=args.checkpoint,
                                   checkpoint_every=args.checkpoint_every)
    print(f"CHILD_DONE jod={Q:.6f}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=3000)
    ap.add_argument("--size", default="3840x2160", metavar="WxH")
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--checkpoint", default="/tmp/fvvdp_soak_ck.npz")
    ap.add_argument("--checkpoint-every", type=int, default=8)
    ap.add_argument("--kill-after-s", type=float, default=None,
                    help="stage-2 DEADLINE for the first checkpoint file to "
                         "appear (the child is SIGKILLed ~2 s after it "
                         "does); default max(60, 2x stage 1's first-call "
                         "time, which includes compiles)")
    args = ap.parse_args()
    args.W, args.H = (int(v) for v in args.size.lower().split("x"))

    if args.child:
        return run_child(args)

    from bench import wait_for_backend
    wait_for_backend()
    import jax

    from fovvideovdp_tpu import fvvdp
    from fovvideovdp_tpu.utils import platform_info

    print(f"# soak: {args.W}x{args.H} x {args.frames} frames on "
          f"{platform_info()}", flush=True)

    # ---- stage 1: uninterrupted -----------------------------------------
    vs = make_source(args.H, args.W, args.frames)
    fv = fvvdp(display_name="standard_4k", heatmap=None)
    t0 = time.time()
    Q0, _ = fv.predict_video_source(vs)
    warm_path = fv._exec_path
    first_s = time.time() - t0
    t0 = time.time()
    Q1, _ = fv.predict_video_source(vs)
    warm_s = time.time() - t0
    mem = hbm_stats()
    r1 = {"stage": "uninterrupted", "jod": round(float(Q1), 6),
          "first_s": round(first_s, 1), "warm_s": round(warm_s, 1),
          "sustained_fps": round(args.frames / warm_s, 1),
          "exec_path": warm_path, "hbm": mem}
    print("SOAK1 " + json.dumps(r1), flush=True)
    assert abs(Q0 - Q1) < 1e-4, (Q0, Q1)
    del fv, vs

    # ---- stage 2: checkpoint, SIGKILL mid-run, resume --------------------
    if os.path.isfile(args.checkpoint):
        os.remove(args.checkpoint)
    cmd = [sys.executable, os.path.abspath(__file__), "--child",
           "--frames", str(args.frames), "--size", args.size,
           "--checkpoint", args.checkpoint,
           "--checkpoint-every", str(args.checkpoint_every)]
    # kill deterministically: wait for the FIRST checkpoint write, then give
    # the child a moment to score further blocks and SIGKILL it mid-flight
    deadline = time.time() + (args.kill_after_s or max(60.0, first_s * 2))
    p = subprocess.Popen(cmd, cwd=REPO, stdout=subprocess.PIPE,
                         stderr=subprocess.DEVNULL, text=True)
    while time.time() < deadline and p.poll() is None \
            and not os.path.isfile(args.checkpoint):
        time.sleep(0.5)
    if p.poll() is None:
        time.sleep(2.0)
        p.send_signal(signal.SIGKILL)
        p.wait()
    else:
        print("SOAK2 {\"error\": \"child completed before any checkpoint "
              "was written; lower --checkpoint-every or raise --frames\"}")
        return 1
    if not os.path.isfile(args.checkpoint):
        print("SOAK2 {\"error\": \"no checkpoint written before the kill "
              "deadline\"}")
        return 1
    ck = np.load(args.checkpoint)
    resumed_from = int(ck["pos"])
    print(f"# killed child mid-run; checkpoint at frame "
          f"{resumed_from}/{args.frames}", flush=True)

    t0 = time.time()
    r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                       timeout=3600)
    resume_s = time.time() - t0
    jod = None
    for line in (r.stdout or "").splitlines():
        if line.startswith("CHILD_DONE"):
            jod = float(line.split("jod=")[1])
    ok = (r.returncode == 0 and jod is not None
          and abs(jod - float(Q1)) < 1e-3 and resumed_from > 0
          and not os.path.isfile(args.checkpoint))
    r2 = {"stage": "kill+resume", "resumed_from_frame": resumed_from,
          "resume_wall_s": round(resume_s, 1),
          "jod": jod, "jod_uninterrupted": round(float(Q1), 6),
          "checkpoint_removed_on_completion":
              not os.path.isfile(args.checkpoint),
          "ok": bool(ok)}
    print("SOAK2 " + json.dumps(r2), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main() or 0)
