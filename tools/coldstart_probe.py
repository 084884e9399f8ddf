"""Cold-start diagnosis: where does a fresh process spend its time before
the first JOD?

Round-3 finding (VERDICT.md): a cold process reached its first image JOD in
~389 s despite a warmed persistent compilation cache — nobody had measured
whether the cache misses across processes or the tunnel dominates.  This
probe times every stage separately in ONE fresh process and reports whether
each XLA program was a persistent-cache hit:

  import_s    - `import fovvideovdp_tpu` (jax import + config)
  backend_s   - first device op (PJRT client creation / tunnel bring-up)
  luts_s      - CSF LUT load + metric construction
  trace_s     - jax trace+lower of the image program
  compile_s   - backend compile (persistent-cache load counts here)
  upload_s    - host->device transfer of the pair
  execute_s   - first execution
  total_s     - process start -> first JOD
  cache       - per-program persistent-cache hit/miss (from jax's own
                cache-miss explanations)

Run it twice back to back: the first run warms the disk cache, the second
(still a fresh process) shows the cross-process behaviour the judge
measured.  Usage: python tools/coldstart_probe.py [--size WxH] [--video]
"""
import argparse
import json
import logging
import os
import sys
import time

T0 = time.time()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1024x683", metavar="WxH",
                    help="image size (round-3 judge drive used 1024x683)")
    ap.add_argument("--video", action="store_true",
                    help="probe the 60-frame 4K video path (scan ladder) "
                         "instead of the image path")
    ap.add_argument("--explain", action="store_true",
                    help="turn on jax's cache-miss explanations (verbose)")
    args = ap.parse_args()
    W, H = (int(v) for v in args.size.lower().split("x"))
    stages = {}

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    t = time.time()
    import numpy as np

    import fovvideovdp_tpu as fv_tpu
    import jax
    import jax.numpy as jnp
    stages["import_s"] = time.time() - t

    if args.explain:
        jax.config.update("jax_explain_cache_misses", True)
    # count persistent-cache hits/misses via jax's own instrumentation
    from jax._src import monitoring
    events = {"hits": 0, "requests": 0, "retrieval_s": 0.0, "saved_s": 0.0}

    def _on_event(event, **kw):
        if event == "/jax/compilation_cache/cache_hits":
            events["hits"] += 1
        elif event == "/jax/compilation_cache/compile_requests_use_cache":
            events["requests"] += 1

    def _on_event_dur(event, duration, **kw):
        if event == "/jax/compilation_cache/cache_retrieval_time_sec":
            events["retrieval_s"] += duration
        elif event == "/jax/compilation_cache/compile_time_saved_sec":
            events["saved_s"] += duration

    monitoring.register_event_listener(_on_event)
    monitoring.register_event_duration_secs_listener(_on_event_dur)

    t = time.time()
    dev = jax.devices()[0]
    jnp.ones(8).sum().block_until_ready()
    stages["backend_s"] = time.time() - t
    stages["platform"] = dev.platform

    t = time.time()
    fv = fv_tpu.fvvdp(display_name="standard_4k")
    core = fv._get_core(W, H)
    stages["luts_s"] = time.time() - t

    rng = np.random.RandomState(0)
    if args.video:
        from fovvideovdp_tpu.video_source import fvvdp_video_source_array
        Wv, Hv, F = 3840, 2160, 60
        base = rng.randint(0, 255, size=(Hv, Wv, 1, 8), dtype=np.uint8)
        reps = -(-F // 8)
        ref_v = np.ascontiguousarray(np.tile(base, (1, 1, 1, reps))[..., :F])
        tst_v = np.clip(ref_v.astype(np.int16) + 5, 0, 255).astype(np.uint8)
        t = time.time()
        vs = fvvdp_video_source_array(tst_v, ref_v, 30, dim_order="HWCF",
                                      display_photometry=fv.display_photometry)
        stages["source_s"] = time.time() - t
        t = time.time()
        Q, _ = fv.predict_video_source(vs)
        stages["first_predict_s"] = time.time() - t
        stages["exec_path"] = fv._exec_path
    else:
        T = (rng.rand(H, W).astype(np.float32) * 100 + 0.1)
        R = np.clip(T + rng.randn(H, W).astype(np.float32), 0.1, None)
        fn = core.image_fn()
        t = time.time()
        lowered = jax.jit(fn).lower(T, R)
        stages["trace_s"] = time.time() - t
        t = time.time()
        compiled = lowered.compile()
        stages["compile_s"] = time.time() - t
        t = time.time()
        Td = jax.device_put(jnp.asarray(T))
        Rd = jax.device_put(jnp.asarray(R))
        jax.block_until_ready((Td, Rd))
        stages["upload_s"] = time.time() - t
        t = time.time()
        Q_per_ch, _ = compiled(Td, Rd)
        jax.block_until_ready(Q_per_ch)
        stages["execute_s"] = time.time() - t

    stages["persistent_cache"] = dict(events)
    stages["cache_dir"] = jax.config.jax_compilation_cache_dir
    stages["total_s"] = time.time() - T0
    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in stages.items()}))


if __name__ == "__main__":
    logging.basicConfig(level=logging.WARNING)
    main()
