"""Regenerate the shipped XLA compile-cache seed (data/xla_seed_cache/).

Why: the benchmark-critical XLA programs (the 4K scan scorer above all)
compile through a remote-compile tunnel with minute-scale latency AND
variance (measured cold first-predicts of 119 s, 317 s and 989 s for the
SAME program on the same day); jax's persistent compilation cache keys are
deterministic across processes, so shipping the serialized executables in
the package makes a cache-cold environment's first call as fast as a warm
one (measured 26 s).  fovvideovdp_tpu/__init__.py hardlinks these entries
into the active cache dir at import.

Run AFTER any change to the compute path (kernels, core, video source) —
stale entries are dead weight (never requested; jax keys on the HLO), but
they don't help either.  Usage:

    python tools/seed_cache.py            # regenerate from bench.py
    python tools/seed_cache.py --verify   # also prove a fresh process hits

The generator runs ``python bench.py`` in a subprocess against a staging
cache dir, keeps every entry above --min-bytes (the sub-second helper
programs recompile faster than they load), and replaces the packaged seed.
"""
import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SEED_DIR = os.path.join(REPO, "fovvideovdp_tpu", "data", "xla_seed_cache")


def run_bench(cache_dir: str, timeout: int) -> dict:
    # FVVDP_NO_SEED_CACHE: the bench subprocess must NOT import-seed the
    # staging dir from the CURRENT packaged seed — that would recycle stale
    # entries into every regenerated seed and fake the cold measurement
    env = dict(os.environ, JAX_COMPILATION_CACHE_DIR=cache_dir,
               FVVDP_NO_SEED_CACHE="1")
    t0 = time.time()
    r = subprocess.run([sys.executable, "bench.py"], cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=timeout)
    out = {}
    for line in r.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                out = json.loads(line)
            except ValueError:
                pass
    if r.returncode != 0:
        tail = "\n".join((r.stderr or "").splitlines()[-8:])
        raise SystemExit(f"bench.py failed (rc={r.returncode}) in "
                         f"{time.time() - t0:.0f}s:\n{tail}")
    out["_wall_s"] = round(time.time() - t0, 1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-bytes", type=int, default=30_000,
                    help="keep only entries at least this large (small "
                         "helper programs recompile in <1 s anyway)")
    ap.add_argument("--staging", default="/tmp/fvvdp_seed_staging")
    ap.add_argument("--timeout", type=int, default=2400,
                    help="per-bench-run timeout (cold compiles through the "
                         "tunnel have reached 16+ minutes)")
    ap.add_argument("--verify", action="store_true",
                    help="after seeding, run bench again in a FRESH cache "
                         "dir populated only by the seed and require "
                         "first_call_s < 60")
    ap.add_argument("--reuse-staging", action="store_true",
                    help="keep existing staging entries (skip the warm-up "
                         "run if the programs are already cached there)")
    ap.add_argument("--grid", metavar="ARGSTR",
                    help="also run tools/benchmark_grid.py with these args "
                         "(ONE shell-quoted string) against the staging "
                         "cache, seeding the grid rows' programs too, e.g. "
                         "--grid '--resolutions 1440x1600 --variants "
                         "foveated-moving --frames 60'")
    args = ap.parse_args()

    if not args.reuse_staging and os.path.isdir(args.staging):
        shutil.rmtree(args.staging)
    os.makedirs(args.staging, exist_ok=True)

    print(f"# populating staging cache {args.staging} via bench.py "
          f"(cold compiles may take many minutes)...", flush=True)
    res = run_bench(args.staging, args.timeout)
    print(f"# bench done in {res.get('_wall_s')}s: first_call_s="
          f"{res.get('first_call_s')}", flush=True)

    if args.grid is not None:
        import shlex
        env = dict(os.environ, JAX_COMPILATION_CACHE_DIR=args.staging,
                   FVVDP_NO_SEED_CACHE="1")
        cmd = [sys.executable, os.path.join("tools", "benchmark_grid.py")] \
            + shlex.split(args.grid)
        print(f"# seeding grid programs: {' '.join(cmd)}", flush=True)
        r = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                           text=True, timeout=args.timeout)
        if r.returncode != 0:
            tail = "\n".join((r.stderr or "").splitlines()[-6:])
            print(f"# WARNING: grid seeding run failed (rc={r.returncode}); "
                  f"keeping whatever it cached:\n{tail}", flush=True)

    entries = sorted(
        (os.path.getsize(os.path.join(args.staging, n)), n)
        for n in os.listdir(args.staging) if n.endswith("-cache"))
    keep = [(sz, n) for sz, n in entries if sz >= args.min_bytes]
    if not keep:
        raise SystemExit("no cache entries above --min-bytes; did the cache "
                         "engage? (JAX_COMPILATION_CACHE_DIR must reach the "
                         "subprocess environment)")

    os.makedirs(SEED_DIR, exist_ok=True)
    for n in os.listdir(SEED_DIR):
        if n.endswith("-cache"):
            os.remove(os.path.join(SEED_DIR, n))
    total = 0
    for sz, n in keep:
        shutil.copyfile(os.path.join(args.staging, n),
                        os.path.join(SEED_DIR, n))
        total += sz
    dropped = len(entries) - len(keep)
    manifest = {
        "generated_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "entries": len(keep),
        "bytes": total,
        "dropped_below_min_bytes": dropped,
        "source": "bench.py cold run",
        "bench_first_call_s": res.get("first_call_s"),
    }
    try:
        import jax
        manifest["jax"] = jax.__version__
    except Exception:
        pass
    with open(os.path.join(SEED_DIR, "MANIFEST.json"), "w",
              encoding="utf-8") as f:
        json.dump(manifest, f, indent=2)
    print(f"# seeded {len(keep)} entries ({total / 2**20:.1f} MiB) into "
          f"{SEED_DIR} (dropped {dropped} below {args.min_bytes} B)",
          flush=True)

    if args.verify:
        fresh = args.staging + "_verify"
        if os.path.isdir(fresh):
            shutil.rmtree(fresh)
        os.makedirs(fresh)
        # populate ONLY from the seed, exactly as __init__ does at import
        for n in os.listdir(SEED_DIR):
            if n.endswith("-cache"):
                shutil.copyfile(os.path.join(SEED_DIR, n),
                                os.path.join(fresh, n))
        print("# verify: bench in a fresh cache dir seeded from the package "
              "...", flush=True)
        res2 = run_bench(fresh, args.timeout)
        print(f"# verify: first_call_s={res2.get('first_call_s')} "
              f"(target < 60)", flush=True)
        if not res2.get("first_call_s") or res2["first_call_s"] >= 60:
            raise SystemExit("seed verification FAILED: first_call_s="
                             f"{res2.get('first_call_s')}")
    print("# done")


if __name__ == "__main__":
    main()
