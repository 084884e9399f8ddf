"""Benchmark grid: resolutions x frame counts, reproducing the reference's
harness matrix (pyfvvdp/benchmark.sh:1-8: 720p/1080p/4K x {1, 60} frames)
with working code (the reference scripts invoke a module that no longer
exists, fvvdp.py:669-735).

Usage: python tools/benchmark_grid.py [--frames 1 60] [--repeats 3]
Prints one JSON line per config.

Every row's JOD is checked against tools/grid_goldens.json (regenerate with
--update-goldens) and the run EXITS NON-ZERO on |dJOD| > 0.01 OR on rows
with no stored golden — perf numbers are only published for correct
numerics, and a fresh checkout without the goldens file fails rather than
passing vacuously.

The goldens file's "_anchors" map records which rows are REFERENCE-
ANCHORED: tools/gen_grid_ref_goldens.py --write-anchors re-scored them
through /root/reference/pyfvvdp on CPU and stored the reference's JOD
there.  Rows absent from "_anchors" are pins of this repo's own hardware
output (drift gates only).
"""
import argparse
import json
import os
import sys
import time

import numpy as np

RESOLUTIONS = [(1280, 720), (1920, 1080), (3840, 2160)]
GOLDENS_PATH = os.path.join(os.path.dirname(__file__), "grid_goldens.json")
JOD_TOL = 0.01


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, nargs="+", default=[1, 60])
    ap.add_argument("--repeats", type=int, default=5,
                    help="warm repeats per row; rows publish min/median/max "
                         "so a real regression is distinguishable from "
                         "transport jitter (observed 5-9%% run-to-run on "
                         "the tunnel)")
    ap.add_argument("--display", default="standard_4k")
    ap.add_argument("--resolutions", nargs="+", metavar="WxH",
                    help="override the default 720p/1080p/4K rows, e.g. "
                         "'--resolutions 1440x1600' for a per-eye VR panel")
    ap.add_argument("--update-goldens", action="store_true",
                    help="write this run's JODs to tools/grid_goldens.json "
                         "instead of asserting against it")
    ap.add_argument("--variants", nargs="+", default=["plain"],
                    choices=["plain", "heatmap", "heatmap-uint8",
                             "heatmap-device", "foveated",
                             "foveated-moving", "batch", "config5"],
                    help="heatmap = threshold heatmap rendered+downloaded per "
                         "block; heatmap-uint8 = same but quantised to uint8 "
                         "on device (heatmap_dtype='uint8', half the readback "
                         "bytes); heatmap-device = rendered on device, output "
                         "left in HBM (device_heatmap=True; timing excludes "
                         "the host readback, which is transport-bound); "
                         "foveated = eccentricity-dependent CSF with a "
                         "fixed central gaze (per-pixel-table path); "
                         "foveated-moving = per-frame gaze trajectory "
                         "(block-amortised trilinear path; video rows only); "
                         "batch = 8 image pairs in one SPMD program "
                         "(predict_batch; frames=1 rows only); "
                         "config5 = BASELINE config 5 e2e: 1080p 10-bit PQ "
                         "BT.2020 .yuv files full-screen-resized to 4K on "
                         "device + threshold heatmap (4K rows, frames>1 only)")
    args = ap.parse_args()

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))
    from bench import wait_for_backend
    wait_for_backend()

    from fovvideovdp_tpu.utils import platform_info
    print(f"# platform: {platform_info()}", file=sys.stderr)

    from fovvideovdp_tpu import fvvdp
    from fovvideovdp_tpu.video_source import fvvdp_video_source_array

    def make_metric(variant):
        # ONE metric object live at a time: the metric caches
        # device-resident artifacts (foveated per-pixel CSF tables are
        # GB-scale at 4K, preloaded videos up to 4 GB) — holding every
        # variant's caches concurrently OOMs the 16 GB chip at the 4K rows.
        if variant == "heatmap":
            return fvvdp(display_name=args.display, heatmap="threshold")
        if variant == "heatmap-uint8":
            return fvvdp(display_name=args.display, heatmap="threshold",
                         heatmap_dtype="uint8")
        if variant == "config5":
            return fvvdp(display_name="standard_hdr_pq", heatmap="threshold")
        if variant == "heatmap-device":
            return fvvdp(display_name=args.display, heatmap="threshold",
                         device_heatmap=True)
        if variant in ("foveated", "foveated-moving"):
            return fvvdp(display_name=args.display, foveated=True)
        return fvvdp(display_name=args.display)   # plain / batch

    import gc

    def row_data(W, H, F):
        # deterministic per row, independent of loop order, so goldens
        # survive grid reorderings and --variants subsets
        rng = np.random.RandomState((W * 7919 + H * 31 + F) % (2 ** 31))
        ref = rng.randint(0, 255, (H, W, 1, F), dtype=np.uint8)
        tst = np.clip(ref.astype(np.int16)
                      + rng.randint(-10, 10, ref.shape), 0,
                      255).astype(np.uint8)
        return ref, tst

    goldens = {}
    if os.path.isfile(GOLDENS_PATH) and not args.update_goldens:
        with open(GOLDENS_PATH, encoding="utf-8") as f:
            goldens = json.load(f)
    failures = []
    new_goldens = {}

    # golden keys carry the display name except for the default display
    # (whose keys predate the --display/--resolutions flags)
    key_prefix = "" if args.display == "standard_4k" else f"{args.display}/"

    def check(key, Q):
        key = key_prefix + key
        new_goldens[key] = round(float(Q), 4)
        if key in goldens and abs(float(Q) - goldens[key]) > JOD_TOL:
            failures.append(f"{key}: JOD {float(Q):.4f} vs golden "
                            f"{goldens[key]} (|d| > {JOD_TOL})")

    def flush_goldens():
        old = {}
        if os.path.isfile(GOLDENS_PATH):
            with open(GOLDENS_PATH, encoding="utf-8") as f:
                old = json.load(f)
        old.update(new_goldens)
        with open(GOLDENS_PATH, "w", encoding="utf-8") as f:
            json.dump(old, f, indent=2, sort_keys=True)

    def timed(fn):
        """args.repeats warm runs -> dict with min/median/max seconds."""
        times = []
        for _ in range(args.repeats):
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
        return {"seconds": round(min(times), 4),
                "seconds_median": round(float(np.median(times)), 4),
                "seconds_max": round(max(times), 4),
                "repeats": len(times)}

    def run_row(fv, variant, W, H, F):
        ref, tst = row_data(W, H, F)
        fps = 0 if F == 1 else 30
        if variant == "batch":
            if F != 1:
                return  # the batch row measures image pairs
            Nb = 8
            tst_b = np.repeat(tst[None, ..., 0], Nb, axis=0)
            ref_b = np.repeat(ref[None, ..., 0], Nb, axis=0)
            jods, _ = fv.predict_batch(tst_b, ref_b,
                                       dim_order="BHWC")  # warm-up

            def _run_batch():
                nonlocal jods
                jods, _ = fv.predict_batch(tst_b, ref_b, dim_order="BHWC")

            t = timed(_run_batch)
            print(json.dumps({
                "resolution": f"{W}x{H}", "frames": 1,
                "variant": "batch", "pairs": Nb, **t,
                "pairs_per_s": round(Nb / t["seconds"], 2),
                "pairs_per_s_median": round(Nb / t["seconds_median"], 2),
                "Q_jod": round(float(jods[0]), 4),
            }), flush=True)
            check(f"{W}x{H}/f1/batch", jods[0])
            return
        if variant == "config5":
            # BASELINE config 5 is a named 4K workload; skip the
            # other grid rows rather than mislabel them
            if (W, H) != (3840, 2160) or F == 1:
                return
            import tempfile
            from fovvideovdp_tpu.video_source_yuv import \
                fvvdp_video_source_yuv_file
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from synth_media import write_config5_yuv_pair
            with tempfile.TemporaryDirectory(prefix="fvvdp_cfg5_") as tdir:
                tst_f, ref_f = write_config5_yuv_pair(tdir, F)
                vs5 = fvvdp_video_source_yuv_file(
                    tst_f, ref_f,
                    display_photometry="standard_hdr_pq",
                    full_screen_resize="bilinear",
                    resize_resolution=[3840, 2160])
                Q5, _ = fv.predict_video_source(vs5)  # warm-up

                def _run_cfg5():
                    nonlocal Q5
                    Q5, st5 = fv.predict_video_source(vs5)
                    st5["heatmap"] = None

                t = timed(_run_cfg5)
            print(json.dumps({
                "resolution": f"{W}x{H}", "frames": F,
                "variant": "config5", **t,
                "fps": round(F / t["seconds"], 2),
                "fps_median": round(F / t["seconds_median"], 2),
                "Q_jod": round(float(Q5), 4),
            }), flush=True)
            check(f"{W}x{H}/f{F}/config5", Q5)
            return
        fix = None
        if variant == "foveated-moving":
            if F == 1:
                return  # the moving-gaze row measures video blocks
            fix = np.stack([np.linspace(10, W - 10, F),
                            np.linspace(10, H - 10, F)]).T
        vs = fvvdp_video_source_array(
            tst, ref, fps, dim_order="HWCF",
            display_photometry=fv.display_photometry)

        def score():
            Q, st = fv.predict_video_source(vs, fixation_point=fix)
            if variant == "heatmap-device":
                # the heatmap stays in HBM; block on it so the
                # timing covers the render, then drop the reference
                # so repeats don't accumulate 4K x 60 fp16 buffers
                import jax
                jax.block_until_ready(st["heatmap"])
                st["heatmap"] = None
            return Q

        Q = score()

        def _run():
            nonlocal Q
            Q = score()

        t = timed(_run)
        print(json.dumps({
            "resolution": f"{W}x{H}", "frames": F, "variant": variant, **t,
            "fps": round(F / t["seconds"], 2),
            "fps_median": round(F / t["seconds_median"], 2),
            "Q_jod": round(float(Q), 4),
        }), flush=True)
        check(f"{W}x{H}/f{F}/{variant}", Q)

    resolutions = RESOLUTIONS
    if args.resolutions:
        resolutions = [tuple(int(v) for v in r.lower().split("x"))
                       for r in args.resolutions]
    for (W, H) in resolutions:
        for variant in args.variants:
            fv = make_metric(variant)
            for F in args.frames:
                # rows are independent measurements: one row crashing (e.g.
                # an HBM OOM at 4K) must not take down the rest of the grid
                # or lose the goldens accumulated so far
                try:
                    run_row(fv, variant, W, H, F)
                except Exception as e:
                    failures.append(
                        f"{key_prefix}{W}x{H}/f{F}/{variant}: crashed: "
                        f"{type(e).__name__}: {str(e)[:300]}")
                    print(f"# ROW FAILED {W}x{H}/f{F}/{variant}: "
                          f"{type(e).__name__}: {str(e)[:300]}",
                          file=sys.stderr, flush=True)
                if args.update_goldens and new_goldens:
                    flush_goldens()  # incremental: survive later crashes
                gc.collect()
            del fv
            gc.collect()

    if args.update_goldens:
        flush_goldens()
        print(f"# wrote {len(new_goldens)} goldens to {GOLDENS_PATH}",
              file=sys.stderr)
        if failures:
            for msg in failures:
                print(f"# ROW FAILURE: {msg}", file=sys.stderr)
            return 1
        return 0
    # a missing goldens file (or missing rows) must FAIL, not silently pass:
    # the parity gate would otherwise be vacuous on a fresh checkout
    missing = [k for k in new_goldens if k not in goldens]
    if missing:
        failures.append(f"no stored goldens for {missing}; run with "
                        f"--update-goldens on trusted hardware to pin them")
    if failures:
        for msg in failures:
            print(f"# PARITY FAILURE: {msg}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
