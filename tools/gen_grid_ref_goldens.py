"""Score benchmark-grid rows through the PyTorch REFERENCE on CPU.

The grid's parity gate (tools/benchmark_grid.py) pins each row's JOD in
tools/grid_goldens.json.  Most rows are regression pins (this repo's own
hardware output, guarding against drift); this tool anchors the rows that
are cheap enough to re-derive from the reference itself
(/root/reference/pyfvvdp/fvvdp.py:181-357) so the gate's trust chain starts
outside the repo: the f1 image rows at every grid resolution, and
optionally short-video smoke variants.

The clip reconstruction is bit-for-bit benchmark_grid.row_data (seeded
RandomState per (W, H, F)).  4K x 60 through the torch reference on this
single-core CPU takes >1 h (see tools/gen_synth_golden.py, which pinned the
bench clip) — video rows are therefore anchored by the already-pinned
synthetic-clip and config5 goldens rather than re-scored here.

Usage: python tools/gen_grid_ref_goldens.py [--frames 1] [--check]
         [--variants plain foveated foveated-moving heatmap]
         [--write-anchors]
  --check: compare against tools/grid_goldens.json and exit non-zero on
           |dJOD| > 0.01 instead of just printing.
  --write-anchors: record each reference-scored JOD in grid_goldens.json's
           "_anchors" map, marking that row as REFERENCE-ANCHORED (trust
           chain starts outside this repo) rather than a self-drift-gate.
           Rows absent from "_anchors" are pins of this repo's own output.

Variant semantics mirror tools/benchmark_grid.py exactly: 'foveated' is a
fixed central gaze (the reference's default fixation), 'foveated-moving'
drives the same linspace corner-to-corner trajectory the grid rows use
(video rows only — per-frame CSF, the reference's slowest path), 'heatmap'
scores with heatmap='threshold' (the JOD must be unchanged by heatmap
rendering; anchoring it checks exactly that through the reference).
"""
import argparse
import json
import os
import sys
import time
import types

import numpy as np

REFERENCE = "/root/reference"
GOLDENS_PATH = os.path.join(os.path.dirname(__file__), "grid_goldens.json")

# stub decode-only deps the reference imports at module scope
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

RESOLUTIONS = [(1280, 720), (1920, 1080), (3840, 2160)]


def row_data(W, H, F):
    """benchmark_grid.row_data, bit-for-bit."""
    rng = np.random.RandomState((W * 7919 + H * 31 + F) % (2 ** 31))
    ref = rng.randint(0, 255, (H, W, 1, F), dtype=np.uint8)
    tst = np.clip(ref.astype(np.int16)
                  + rng.randint(-10, 10, ref.shape), 0,
                  255).astype(np.uint8)
    return ref, tst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, nargs="+", default=[1])
    ap.add_argument("--resolutions", nargs="+", metavar="WxH")
    ap.add_argument("--variants", nargs="+", default=["plain"],
                    choices=["plain", "foveated", "foveated-moving",
                             "heatmap"])
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--write-anchors", action="store_true")
    args = ap.parse_args()

    import torch
    torch.set_num_threads(max(1, os.cpu_count() or 1))
    from pyfvvdp.fvvdp import fvvdp
    from pyfvvdp.video_source import fvvdp_video_source_array

    resolutions = RESOLUTIONS
    if args.resolutions:
        resolutions = [tuple(int(v) for v in r.lower().split("x"))
                       for r in args.resolutions]

    goldens = {}
    if os.path.isfile(GOLDENS_PATH):
        with open(GOLDENS_PATH, encoding="utf-8") as f:
            goldens = json.load(f)

    def make_metric(variant):
        kw = {"device": torch.device("cpu")}
        if variant in ("foveated", "foveated-moving"):
            kw["foveated"] = True
        if variant == "heatmap":
            kw["heatmap"] = "threshold"
        return fvvdp(display_name="standard_4k", **kw)

    failures = []
    anchors = {}
    for variant in args.variants:
        fv = make_metric(variant)
        for (W, H) in resolutions:
            for F in args.frames:
                if variant == "foveated-moving" and F == 1:
                    continue  # the moving-gaze rows are video rows
                ref, tst = row_data(W, H, F)
                fps = 0 if F == 1 else 30
                fix = None
                if variant == "foveated-moving":
                    # bit-identical to benchmark_grid's trajectory
                    fix = torch.tensor(np.stack(
                        [np.linspace(10, W - 10, F),
                         np.linspace(10, H - 10, F)]).T)
                vs = fvvdp_video_source_array(
                    torch.tensor(tst), torch.tensor(ref), fps,
                    dim_order="HWCF",
                    display_photometry=fv.display_photometry)
                t0 = time.time()
                Q, _ = fv.predict_video_source(vs, fixation_point=fix)
                dt = time.time() - t0
                key = f"{W}x{H}/f{F}/{variant}"
                line = (f"reference {key}: JOD {float(Q):.6f} ({dt:.0f}s)")
                anchors[key] = round(float(Q), 4)
                if key in goldens:
                    d = abs(float(Q) - goldens[key])
                    line += f" | grid golden {goldens[key]} |d|={d:.4f}"
                    if d > 0.01:
                        failures.append(key)
                print(line, flush=True)
                if args.write_anchors:
                    # incremental: a multi-hour run killed mid-way keeps
                    # the anchors it earned
                    _write_anchors(anchors)
    if args.write_anchors:
        _write_anchors(anchors)
    if args.check and failures:
        print(f"PARITY FAILURE vs reference: {failures}", file=sys.stderr)
        return 1
    return 0


def _write_anchors(anchors: dict) -> None:
    """Merge reference-scored JODs into grid_goldens.json under "_anchors".

    A row present in "_anchors" is REFERENCE-ANCHORED: its pinned JOD was
    reproduced through /root/reference/pyfvvdp on CPU (value recorded here,
    |d| <= 0.01 enforced by --check).  Rows without an anchor are pins of
    this repo's own hardware output (drift gates only).
    """
    data = {}
    if os.path.isfile(GOLDENS_PATH):
        with open(GOLDENS_PATH, encoding="utf-8") as f:
            data = json.load(f)
    merged = dict(data.get("_anchors", {}))
    merged.update(anchors)
    data["_anchors"] = merged
    tmp = GOLDENS_PATH + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(data, f, indent=2, sort_keys=True)
    os.replace(tmp, GOLDENS_PATH)


if __name__ == "__main__":
    sys.exit(main())
