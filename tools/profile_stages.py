"""Per-stage device-time breakdown of one streaming block.

Times each hot stage of the fused video path standalone (device-resident
inputs, ``block_until_ready``, best of ``--repeats``): the two-stream
temporal-channel kernel, the Gaussian-pyramid reduce chain, and the fused
per-level band scorers — the same decomposition as the full streaming step
(core._video_step), so the rows add up to (slightly less than) the step's
device time.  The remainder is XLA glue (pads, slices, pooling).

Prints one markdown table row per stage — the source of ARCHITECTURE.md's
device-time breakdown.  Run on the real chip: ``python tools/profile_stages.py``.

Content is band-limited random luminance (a smooth 1/f-ish field plus noise)
rather than white noise, so the per-strip background-luminance windows —
which the dynamic knot-window CSF loop (ops/pallas/score_math.py) depends
on — are representative of natural content.
"""
import argparse
import sys
import time

import numpy as np


def _best_of(fn, repeats):
    import jax
    fn()  # warm-up / compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=3840)
    ap.add_argument("--height", type=int, default=2160)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--display", default="standard_4k")
    args = ap.parse_args()

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))
    from bench import wait_for_backend
    wait_for_backend()

    import jax
    import jax.numpy as jnp

    from fovvideovdp_tpu import fvvdp
    from fovvideovdp_tpu.ops import temporal as temporal_ops
    from fovvideovdp_tpu.ops.pallas import band_pipeline as bp

    H, W = args.height, args.width
    fv = fvvdp(display_name=args.display)
    core = fv._get_core(W, H)
    plan = core.plan
    fps = 30.0
    fl = temporal_ops.filter_len_for_fps(fps)
    filt = temporal_ops.temporal_filters(fps, fl, fv.sustained_sigma,
                                         fv.sustained_beta)
    B = fv._pick_block_size(H, W, 10_000)

    # Smooth linear-luminance field (display range ~0.5-200 cd/m2) + noise:
    # locally narrow L_bkg like natural content, globally wide.  The default
    # path feeds LINEAR luminance into the step (fvvdp.py:273-274).
    rng = np.random.RandomState(0)
    base = rng.rand(B + fl - 1, H // 32 + 1, W // 32 + 1).astype(np.float32)
    base = np.stack([np.kron(b, np.ones((32, 32), np.float32))[:H, :W]
                     for b in base])
    lum_t = (0.5 + 200.0 * base
             + rng.rand(*base.shape).astype(np.float32) * 5.0)
    lum_r = lum_t * (1.0 + rng.randn(*base.shape).astype(np.float32) * 0.02)
    pt = jnp.asarray(lum_t)
    pr = jnp.asarray(np.clip(lum_r, 0.005, None))

    temporal_jit = jax.jit(
        lambda a, b: temporal_ops.temporal_channels(a, b, filt))
    t_temporal = _best_of(lambda: temporal_jit(pt, pr), args.repeats)
    R = jax.block_until_ready(temporal_jit(pt, pr))

    t_pyr = _best_of(lambda f=jax.jit(plan.gaussian_pyramid): f(R),
                     args.repeats)
    gpyr = [jax.block_until_ready(g) for g in jax.jit(plan.gaussian_pyramid)(R)]

    p = core.params
    n_bands = plan.get_band_count()
    t_levels = []
    for bb in range(plan.height):
        gain = plan.band_gain(bb, n_bands)

        def call(bb=bb, gain=gain):
            return bp.expand_score2(
                gpyr[bb], gpyr[bb + 1], core._score_tables[bb],
                core._score_lut, p["mask_p"], p["mask_q_sust"],
                p["mask_q_trans"], p["mask_c"], gain, p["beta"])

        t_levels.append(_best_of(jax.jit(call), args.repeats))

    # the full one-dispatch streaming step, for the "everything else" line
    step = core.video_block_step_fn(np.asarray(filt))
    carry_t, carry_r = pt[:fl - 1], pr[:fl - 1]
    t_step = _best_of(lambda: step(carry_t, carry_r, pt[fl - 1:], pr[fl - 1:]),
                      args.repeats)

    print(f"# {W}x{H}, block of {B} output frames (+{fl - 1} carry), "
          f"device {jax.devices()[0].device_kind}, best of {args.repeats}")
    rows = [("temporal-channel kernel", t_temporal),
            ("pyramid reduce chain (all levels)", t_pyr)]
    rows += [(f"fused level-{bb} scorer", t)
             for bb, t in enumerate(t_levels)]
    accounted = t_temporal + t_pyr + sum(t_levels)
    rows.append(("XLA glue (pads/pooling/slices) = step - stages",
                 max(0.0, t_step - accounted)))
    rows.append(("FULL streaming step (one dispatch)", t_step))
    for name, t in rows:
        print(f"| {name} | {t * 1000:7.1f} ms | {t * 1000 / B:5.2f} ms/frame |")
    print(f"# step throughput: {B / t_step:.1f} fps device-side")


if __name__ == "__main__":
    main()
