"""Multi-host (multi-process) batch farming: two local CPU processes form a
4-device 'cluster'; each feeds its own pairs into ONE predict_batch SPMD
program and must get back exactly the scores a single process computes for
the same pairs.  (SURVEY.md section 5 'distributed backend' — the DCN-level
replacement for the reference's SLURM farming, benchmark_cluster.sh.)"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_predict_batch(tmp_path):
    from conftest import cpu_subprocess_env
    port = _free_port()
    env = cpu_subprocess_env(n_devices=2)
    repo_root = os.path.dirname(os.path.dirname(WORKER))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")

    outs = [str(tmp_path / f"out{i}.json") for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, "-u", WORKER, str(i), str(port), outs[i]],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(2)]
    for p in procs:
        try:
            _, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err

    # every process got scores for ITS OWN pairs, equal to scoring them alone
    sys.path.insert(0, os.path.dirname(WORKER))
    from _multihost_worker import make_pairs, make_video_pairs
    from fovvideovdp_tpu import fvvdp

    fv = fvvdp(display_name="standard_fhd")
    for pid in range(2):
        res = json.load(open(outs[pid]))
        assert res["n_processes"] == 2
        tst, ref = make_pairs(pid)
        tst_v, ref_v = make_video_pairs(pid)
        assert len(res["jods"]) == 2 and len(res["jods_video"]) == 2
        assert res["q_per_ch_shape"][2] == 2  # this process's pairs only
        for k in range(2):
            q_solo, _ = fv.predict(tst[k], ref[k], dim_order="HWC")
            np.testing.assert_allclose(res["jods"][k], q_solo,
                                       rtol=1e-5, atol=1e-4)
            qv_solo, _ = fv.predict(tst_v[k], ref_v[k], dim_order="FHWC",
                                    frames_per_second=30)
            np.testing.assert_allclose(res["jods_video"][k], qv_solo,
                                       rtol=1e-5, atol=1e-4)
