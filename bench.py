"""Benchmark: full-reference 4K video scoring throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: 30 fps real-time 4K scoring (BASELINE.md north-star; the reference
publishes no timing numbers).

Methodology matches the reference's own benchmark harness
(pyfvvdp/fvvdp.py:726-735: content is placed on the device once, then the
metric computation is timed): the video source is constructed once — its
display-encoded uint8 frames live in HBM — and scoring (EOTF, temporal
channels, pyramid, CSF, masking, pooling) is timed end-to-end over it.
Ancillary numbers (first-call compile, warm-cache latency, per-image
latency) go to stderr.

Perf and parity are inseparable: before the throughput line is printed, the
scored JODs are checked against golden values (the README-published
wavy_facade numbers when the media is present, plus a pinned value for the
synthetic clip) and the benchmark EXITS NON-ZERO on |dJOD| > 0.01 — a kernel
optimisation that drifts the metric can never post a green perf number.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

# parity goldens: README.md:137-138 published JODs for wavy_facade on
# standard_4k, and the synthetic-clip JOD scored through the PyTorch
# REFERENCE on CPU (tools/gen_synth_golden.py, /root/reference/pyfvvdp
# fvvdp.py:181-357 video path: printed "reference JOD 9.768775 for
# 3840x2160 x60 synthetic clip") — no golden here originates from this
# repo's own output
GOLDEN_WAVY_NOISE = 9.537
GOLDEN_WAVY_BLUR = 8.693
GOLDEN_SYNTH_Q = 9.7688
JOD_TOL = 0.01
WAVY = "/root/reference/example_media/wavy_facade.png"


def wait_for_backend(attempts=8, probe_timeout=90, retry_sleep=60):
    """Probe TPU-backend initialisation in a *subprocess* before using it.

    ``jax.devices()`` blocks indefinitely inside PJRT client creation when the
    device tunnel is wedged (e.g. an unreleased grant from a killed process) —
    a state observed in this environment.  A hung child can be killed; a hung
    in-process C call cannot.  Retry for a few minutes so a transient wedge
    clears, then fail loudly instead of hanging the harness.
    """
    probe = ("import jax; import jax.numpy as jnp; "
             "jnp.ones(8).sum().block_until_ready(); "
             "print(jax.devices()[0].platform)")
    # A TPU whose client creation FAILS (rather than hangs) makes JAX fall
    # back to CPU with only a warning — zero exit, wrong device.  Unless the
    # caller explicitly allows CPU, a cpu-platform probe is a failed probe.
    allow_cpu = os.environ.get("FVVDP_BENCH_ALLOW_CPU", "") == "1" \
        or os.environ.get("JAX_PLATFORMS", "") == "cpu"
    for i in range(attempts):
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True, text=True,
                               timeout=probe_timeout, env=os.environ.copy())
            platform = r.stdout.strip().splitlines()[-1] if r.stdout.strip() \
                else ""
            if r.returncode == 0 and (platform != "cpu" or allow_cpu):
                return
            if r.returncode == 0:
                err = ("backend fell back to CPU; refusing to benchmark it "
                       "as the device (set FVVDP_BENCH_ALLOW_CPU=1 to allow)")
            else:
                err = r.stderr.strip().splitlines()
                err = err[-1] if err else "unknown error"
        except subprocess.TimeoutExpired:
            err = f"backend init hung > {probe_timeout}s"
        print(f"# backend probe {i + 1}/{attempts} failed: {err}",
              file=sys.stderr, flush=True)
        if i + 1 < attempts:
            time.sleep(retry_sleep)
    raise SystemExit("device backend unavailable (all probes failed); "
                     "not starting the benchmark against a wedged device")


def check_parity(failures):
    """README-published wavy_facade JODs on the device under benchmark.
    Appends human-readable failure strings to ``failures``."""
    if not os.path.isfile(WAVY):
        print("# parity: wavy_facade media absent, README goldens skipped",
              file=sys.stderr)
        return
    try:
        from scipy.ndimage import gaussian_filter
    except ImportError:
        print("# parity: scipy absent, README goldens skipped",
              file=sys.stderr)
        return
    import fovvideovdp_tpu as fv_tpu

    I = fv_tpu.load_image_as_array(WAVY)
    rng = np.random.RandomState(42)
    noise = (np.clip(I / 65535.0 + rng.randn(*I.shape) * np.sqrt(0.003),
                     0, 1) * 65535).astype(np.uint16)
    blur = np.stack([gaussian_filter(I[:, :, c].astype(np.float32), 2,
                                     mode="nearest", truncate=2.0)
                     for c in range(3)], -1).astype(np.uint16)
    fv = fv_tpu.fvvdp(display_name="standard_4k")
    Q_noise, _ = fv.predict(noise, I, dim_order="HWC")
    Q_blur, _ = fv.predict(blur, I, dim_order="HWC")
    print(f"# parity: wavy_facade noise {Q_noise:.4f} (golden "
          f"{GOLDEN_WAVY_NOISE}) | blur {Q_blur:.4f} (golden "
          f"{GOLDEN_WAVY_BLUR})", file=sys.stderr)
    if abs(Q_noise - GOLDEN_WAVY_NOISE) > JOD_TOL:
        failures.append(f"wavy_facade noise JOD {Q_noise:.4f} vs "
                        f"{GOLDEN_WAVY_NOISE} (|d| > {JOD_TOL})")
    if abs(Q_blur - GOLDEN_WAVY_BLUR) > JOD_TOL:
        failures.append(f"wavy_facade blur JOD {Q_blur:.4f} vs "
                        f"{GOLDEN_WAVY_BLUR} (|d| > {JOD_TOL})")


def main():
    wait_for_backend()
    import jax
    from fovvideovdp_tpu import fvvdp
    from fovvideovdp_tpu.video_source import fvvdp_video_source_array

    H, W = 2160, 3840
    fps = 30.0
    n_frames = 60
    rng = np.random.RandomState(0)

    base = rng.randint(0, 255, size=(H, W, 1, 8), dtype=np.uint8)
    test = np.clip(base.astype(np.int16) + rng.randint(-12, 12, size=base.shape),
                   0, 255).astype(np.uint8)
    reps = -(-n_frames // base.shape[-1])
    ref_v = np.ascontiguousarray(np.tile(base, (1, 1, 1, reps))[..., :n_frames])
    test_v = np.ascontiguousarray(np.tile(test, (1, 1, 1, reps))[..., :n_frames])

    fv = fvvdp(display_name="standard_4k", heatmap=None)
    vs = fvvdp_video_source_array(test_v, ref_v, fps, dim_order="HWCF",
                                  display_photometry=fv.display_photometry)

    # warm-up: compiles + uploads the source to HBM (first-call latency is a
    # tracked number — the scan-chunk ladder bounds it: one compile per
    # ladder rung serves every video length)
    t0 = time.time()
    Q_video, _ = fv.predict_video_source(vs)
    compile_s = time.time() - t0

    # >= 5 warm repeats with published min/median/max: single best-of-N
    # numbers made round-over-round deltas unreadable (a 3% "regression"
    # between rounds sat inside the 5-9% run-to-run transport jitter
    # observed on this tunnel)
    times = []
    for _ in range(5):
        t0 = time.time()
        Q_video, _ = fv.predict_video_source(vs)
        times.append(time.time() - t0)
    best = min(times)
    med = float(np.median(times))
    fps_throughput = n_frames / best

    # ancillary: per-image-pair latency at 4K, two honest numbers
    # (methodology shared with tools/benchmark_grid.py):
    # * device-resident: the source lives in HBM, timing covers scoring only
    #   (the reference's own methodology, pyfvvdp/fvvdp.py:726-735)
    # * cold end-to-end: includes source construction + host->device transfer
    #   (transport-bound: ~40 MB/s through this environment's TPU tunnel)
    img_t = test_v[..., :1]
    img_r = ref_v[..., :1]
    vs_img = fvvdp_video_source_array(img_t, img_r, 0, dim_order="HWCF",
                                      display_photometry=fv.display_photometry)
    fv.predict_video_source(vs_img)  # warm-up: compile + upload
    img_ms = None
    for _ in range(3):
        t0 = time.time()
        fv.predict_video_source(vs_img)
        dt = (time.time() - t0) * 1000
        img_ms = dt if img_ms is None else min(img_ms, dt)
    t0 = time.time()
    fv.predict(img_t, img_r, dim_order="HWCF")
    img_cold_ms = (time.time() - t0) * 1000

    # parity gate: the throughput number is only published if the JODs are
    # right (bench exits non-zero on |dJOD| > JOD_TOL)
    failures = []
    if abs(Q_video - GOLDEN_SYNTH_Q) > JOD_TOL:
        failures.append(f"synthetic 4K clip JOD {Q_video:.4f} vs pinned "
                        f"{GOLDEN_SYNTH_Q} (|d| > {JOD_TOL})")
    check_parity(failures)

    print(f"# first-call (compile+upload) {compile_s:.1f}s | warm-cache "
          f"60-frame 4K video min {best:.2f}s / median {med:.2f}s / max "
          f"{max(times):.2f}s over {len(times)} repeats ({fps_throughput:.1f} "
          f"fps at min, {n_frames / med:.1f} at median) | 4K "
          f"image pair {img_ms:.0f} ms device-resident / {img_cold_ms:.0f} ms "
          f"cold incl. transfer | Q={Q_video:.4f} | device "
          f"{jax.devices()[0].device_kind}", file=sys.stderr)
    from fovvideovdp_tpu.utils import platform_info
    print(f"# platform: {platform_info()}", file=sys.stderr)
    if failures:
        for f in failures:
            print(f"# PARITY FAILURE: {f}", file=sys.stderr)
        raise SystemExit("benchmark aborted: JOD parity drifted — a perf "
                         "number for wrong numerics is meaningless")
    print(json.dumps({
        "metric": "4k_video_fps_per_chip",
        "value": round(fps_throughput, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps_throughput / 30.0, 3),
        # tracked round-over-round: process start -> first 4K video JOD
        # (compile or persistent-cache load + upload), and the pure scoring
        # latency of a warm process.  warm_video_s stays the min (the
        # historical definition); the median and [min, median, max] spread
        # make a real regression distinguishable from transport jitter.
        "first_call_s": round(compile_s, 1),
        "warm_video_s": round(best, 3),
        "warm_video_s_median": round(med, 3),
        "spread": [round(t, 3) for t in
                   (min(times), med, max(times))],
    }))


if __name__ == "__main__":
    main()
