"""Probe: does compiled.memory_analysis() work through the axon tunnel, and
what are the REAL temp sizes of the 4K step/scan programs (plain vs moving
gaze)?  Compile-only — nothing is dispatched, so this cannot OOM-poison the
session.  Run solo."""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))

import numpy as np
import jax

import fovvideovdp_tpu as fv_tpu
from fovvideovdp_tpu.ops import temporal as temporal_ops

W, H = 3840, 2160
FPS = 30.0


def report(tag, jitted, avals):
    t0 = time.time()
    compiled = jitted.lower(*avals).compile()
    dt = time.time() - t0
    try:
        ma = compiled.memory_analysis()
        print(f"{tag}: compile {dt:.0f}s  args={ma.argument_size_in_bytes/2**30:.2f} "
              f"out={ma.output_size_in_bytes/2**30:.2f} "
              f"temp={ma.temp_size_in_bytes/2**30:.2f} GiB "
              f"(alias={ma.alias_size_in_bytes/2**30:.2f})", flush=True)
        return ma
    except Exception as e:
        print(f"{tag}: compile {dt:.0f}s  memory_analysis FAILED: {e!r}",
              flush=True)
        return None


def f32(*shape):
    return jax.ShapeDtypeStruct(shape, np.float32)


fl = temporal_ops.filter_len_for_fps(FPS)
filt = temporal_ops.temporal_filters(FPS, fl)
print(f"fl={fl}", flush=True)

for label, fov in (("plain", False), ("moving", True)):
    fv = fv_tpu.fvvdp(display_name="standard_4k", foveated=fov)
    core = fv._get_core(W, H)
    B = fv._pick_block_size(H, W, 60)
    print(f"{label}: B={B}", flush=True)
    step = core.video_block_step_fn(filt, static_gaze=None)
    carry = f32(fl - 1, H, W)
    blk = f32(B, H, W)
    args = [carry, carry, blk, blk]
    if fov:
        args.append(f32(B, 2))
    report(f"{label} step B={B}", step, args)
    for k in (1, 2):
        scan = core.video_scan_fn(filt, B, k)
        cargs = [carry, carry, f32(k * B, H, W), f32(k * B, H, W)]
        if fov:
            cargs.append(f32(k, B, 2))
        report(f"{label} scan k={k} B={B}", scan, cargs)
print("PROBE OK", flush=True)
