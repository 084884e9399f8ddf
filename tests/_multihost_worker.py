"""Worker for test_multihost.py: one process of a 2-process CPU 'cluster'.

Each process scores ITS OWN pairs through fvvdp.predict_batch on the global
mesh; the batch axis shards over both processes' devices (DCN-style batch
farming, the SPMD replacement for pyfvvdp/benchmark_cluster.sh).
"""
import json
import sys

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")


def make_pairs(pid):
    rng = np.random.RandomState(100 + pid)
    H, W = 32, 48
    ref = (rng.rand(2, H, W, 3) * 255).astype(np.uint8)
    tst = np.clip(ref.astype(np.int16) + rng.randint(-30, 30, ref.shape),
                  0, 255).astype(np.uint8)
    return tst, ref


def make_video_pairs(pid):
    rng = np.random.RandomState(200 + pid)
    F, H, W = 3, 32, 48
    ref = (rng.rand(2, F, H, W, 1) * 255).astype(np.uint8)
    tst = np.clip(ref.astype(np.int16) + rng.randint(-30, 30, ref.shape),
                  0, 255).astype(np.uint8)
    return tst, ref


def main():
    pid, port, out = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    from fovvideovdp_tpu.parallel import init_multihost
    init_multihost(f"localhost:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2 and jax.device_count() == 4

    from fovvideovdp_tpu import fvvdp
    tst, ref = make_pairs(pid)
    fv = fvvdp(display_name="standard_fhd")
    jods, stats = fv.predict_batch(tst, ref, dim_order="BHWC")
    tst_v, ref_v = make_video_pairs(pid)
    jods_v, stats_v = fv.predict_batch(tst_v, ref_v, dim_order="BFHWC",
                                       frames_per_second=30)
    with open(out, "w") as f:
        json.dump({"jods": np.asarray(jods).tolist(),
                   "jods_video": np.asarray(jods_v).tolist(),
                   "q_per_ch_shape": list(stats_v["Q_per_ch"].shape),
                   "n_processes": stats["n_processes"]}, f)


if __name__ == "__main__":
    main()
