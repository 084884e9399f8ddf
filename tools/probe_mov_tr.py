"""Measure the moving-gaze kernel's COMPILE cost vs warm throughput per
tile height TR (VERDICT r4 #5: the TR=64 2x-unrolled default compiles for
minutes through the remote-compile tunnel; nobody had weighed that against
its ~10-20%% warm-throughput edge).

For each TR the probe launches a FRESH python subprocess (FVVDP_MOV_TR is
read at trace time) with a FRESH compile-cache dir (so the compile is
real), scores a synthetic foveated moving-gaze clip, and reports:

  first_call_s   process-level first predict (trace + compile + execute)
  warm_s_min/med scoring latency after compile (5 repeats)

Compile times through the tunnel carry minute-scale run-to-run variance
(measured 119-989 s for one identical program); run with --repeats 2+ and
read the MINIMUM as the intrinsic cost, the spread as tunnel noise.

Usage: python tools/probe_mov_tr.py [--trs 16 32 64] [--size 1440x1600]
       [--frames 60] [--repeats 1]
"""
import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
import numpy as np
sys.path.insert(0, {repo!r})
import fovvideovdp_tpu as fv_tpu
from fovvideovdp_tpu.video_source import fvvdp_video_source_array
W, H, F = {W}, {H}, {F}
rng = np.random.RandomState(0)
base = rng.randint(0, 255, size=(H, W, 1, 8), dtype=np.uint8)
reps = -(-F // 8)
ref_v = np.ascontiguousarray(np.tile(base, (1, 1, 1, reps))[..., :F])
tst_v = np.clip(ref_v.astype(np.int16) + 7, 0, 255).astype(np.uint8)
fix = np.stack([np.linspace(10, W - 10, F), np.linspace(10, H - 10, F)]).T
fv = fv_tpu.fvvdp(display_name={display!r}, foveated=True)
vs = fvvdp_video_source_array(tst_v, ref_v, 30.0, dim_order="HWCF",
                              display_photometry=fv.display_photometry)
t0 = time.time()
Q, _ = fv.predict_video_source(vs, fixation_point=fix)
first = time.time() - t0
times = []
for _ in range(5):
    t0 = time.time()
    Q, _ = fv.predict_video_source(vs, fixation_point=fix)
    times.append(time.time() - t0)
times.sort()
print("CHILD " + json.dumps({{
    "tr": int(os.environ.get("FVVDP_MOV_TR", 0)) or "default",
    "first_call_s": round(first, 1),
    "warm_s_min": round(times[0], 4),
    "warm_s_med": round(times[len(times) // 2], 4),
    "fps_min_time": round(F / times[0], 1),
    "jod": round(float(Q), 4),
    "exec_path": fv._exec_path,
}}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trs", type=int, nargs="+", default=[16, 32, 64])
    ap.add_argument("--size", default="1440x1600", metavar="WxH")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--display", default="htc_vive_pro")
    ap.add_argument("--repeats", type=int, default=1,
                    help="fresh-compile repeats per TR (tunnel variance)")
    ap.add_argument("--timeout", type=int, default=2400)
    args = ap.parse_args()
    W, H = (int(v) for v in args.size.lower().split("x"))

    script = CHILD.format(repo=REPO, W=W, H=H, F=args.frames,
                          display=args.display)
    for tr in args.trs:
        for rep in range(args.repeats):
            cache = tempfile.mkdtemp(prefix=f"movtr{tr}_")
            # FVVDP_NO_SEED_CACHE: the packaged seed would turn the default
            # tiling's compile into a cache hit, biasing the comparison
            env = dict(os.environ, FVVDP_MOV_TR=str(tr),
                       JAX_COMPILATION_CACHE_DIR=cache,
                       FVVDP_NO_SEED_CACHE="1")
            t0 = time.time()
            try:
                r = subprocess.run([sys.executable, "-c", script], env=env,
                                   cwd=REPO, capture_output=True, text=True,
                                   timeout=args.timeout)
                line = next((ln for ln in r.stdout.splitlines()
                             if ln.startswith("CHILD ")), None)
                if r.returncode != 0 or line is None:
                    tail = "\n".join((r.stderr or "").splitlines()[-4:])
                    print(json.dumps({"tr": tr, "rep": rep, "error": tail,
                                      "wall_s": round(time.time() - t0, 1)}),
                          flush=True)
                else:
                    d = json.loads(line[6:])
                    d["rep"] = rep
                    d["wall_s"] = round(time.time() - t0, 1)
                    print(json.dumps(d), flush=True)
            except subprocess.TimeoutExpired:
                print(json.dumps({"tr": tr, "rep": rep,
                                  "error": f"timeout {args.timeout}s"}),
                      flush=True)
            finally:
                shutil.rmtree(cache, ignore_errors=True)


if __name__ == "__main__":
    main()
