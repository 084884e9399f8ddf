"""Multi-device sharding tests on the 8-device virtual CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fovvideovdp_tpu.ops import temporal as temporal_ops
from fovvideovdp_tpu.parallel import make_mesh, shard_video_block_fn, shard_image_fn


def _cpu_devices(n):
    devs = jax.devices("cpu")
    if len(devs) < n:
        pytest.skip(f"need {n} cpu devices, have {len(devs)}")
    return devs[:n]


def _make_core(W=64, H=48):
    import __graft_entry__ as ge
    return ge._make_core(W, H)


def test_sharded_video_matches_single_device():
    core = _make_core()
    fps, B = 30.0, 8
    fl = temporal_ops.filter_len_for_fps(fps)
    filt = temporal_ops.temporal_filters(fps, fl)

    rng = np.random.RandomState(0)
    padded_t = jnp.asarray(rng.rand(B + fl - 1, 48, 64).astype(np.float32) * 100 + 0.1)
    padded_r = padded_t * 1.02 + 0.3

    Q_single, _ = core.video_block_fn(filt)(padded_t, padded_r)

    mesh = make_mesh(_cpu_devices(8), data_parallel=4)
    Q_sharded, _ = shard_video_block_fn(core, filt, mesh)(padded_t, padded_r)

    np.testing.assert_allclose(np.asarray(Q_sharded), np.asarray(Q_single),
                               rtol=2e-5, atol=1e-6)


def test_sharded_image_matches_single_device():
    core = _make_core()
    rng = np.random.RandomState(1)
    T = jnp.asarray(rng.rand(48, 64).astype(np.float32) * 200 + 0.1)
    R = T + 1.0

    Q_single, _ = core.image_fn()(T, R)
    mesh = make_mesh(_cpu_devices(8), data_parallel=1)  # all-space mesh
    Q_sharded, _ = shard_image_fn(core, mesh)(T, R)
    np.testing.assert_allclose(np.asarray(Q_sharded), np.asarray(Q_single),
                               rtol=2e-5, atol=1e-6)


def test_graft_entry_dryrun():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_sharded_video_pallas_interpret_matches_single_device():
    """The sharded scorer must run the SAME Pallas kernels per shard that a
    single chip runs; interpret mode emulates them on the CPU mesh."""
    from fovvideovdp_tpu.ops import pallas as pallas_cfg

    fps, B, H, W = 30.0, 8, 64, 128
    fl = temporal_ops.filter_len_for_fps(fps)
    filt = temporal_ops.temporal_filters(fps, fl)
    rng = np.random.RandomState(2)
    pt = jnp.asarray(rng.rand(B + fl - 1, H, W).astype(np.float32) * 100 + 0.1)
    pr = pt * 1.03 + 0.2

    core = _make_core(W, H)
    Q_ref, _ = core.video_block_fn(filt)(pt, pr)

    mesh = make_mesh(_cpu_devices(8), data_parallel=4)
    with pallas_cfg.forced(True, interpret=True):
        core_p = _make_core(W, H)
        Q_p, _ = shard_video_block_fn(core_p, filt, mesh)(pt, pr)
    np.testing.assert_allclose(np.asarray(Q_p), np.asarray(Q_ref),
                               rtol=5e-5, atol=1e-6)


def test_batch_video_scorer_matches_per_clip():
    from fovvideovdp_tpu.ops import masking as mask_ops
    from fovvideovdp_tpu.parallel import make_batch_video_scorer
    from fovvideovdp_tpu.utils import config_files, json2dict

    params = json2dict(config_files.find("fvvdp_parameters.json"))
    core = _make_core()
    fps, B = 30.0, 4
    fl = temporal_ops.filter_len_for_fps(fps)
    filt = temporal_ops.temporal_filters(fps, fl)
    rng = np.random.RandomState(4)
    N = 8
    pts = jnp.asarray(rng.rand(N, B + fl - 1, 48, 64).astype(np.float32) * 100 + 0.1)
    prs = pts * 1.01 + 0.2

    mesh = make_mesh(_cpu_devices(8), data_parallel=8)
    jods, Q_pc = make_batch_video_scorer(core, filt, mesh, params)(pts, prs)
    jods = np.asarray(jods)
    assert jods.shape == (N,) and np.asarray(Q_pc).shape[2:] == (N, B)

    fn_single = core.video_block_fn(filt)
    for i in [0, 5]:
        Q_c, _ = fn_single(pts[i], prs[i])
        j = float(mask_ops.pool_to_jod(
            Q_c, params["w_transient"], params["beta_sch"], params["beta_tch"],
            params["beta_t"], params["jod_a"], params["log_jod_exp"]))
        np.testing.assert_allclose(jods[i], j, rtol=1e-5, atol=1e-5)


def test_video_block_not_divisible_raises():
    core = _make_core()
    fps = 30.0
    fl = temporal_ops.filter_len_for_fps(fps)
    filt = temporal_ops.temporal_filters(fps, fl)
    mesh = make_mesh(_cpu_devices(8), data_parallel=4)
    rng = np.random.RandomState(0)
    pt = jnp.asarray(rng.rand(3 + fl - 1, 48, 64).astype(np.float32) + 0.1)
    with pytest.raises(ValueError, match="not divisible"):
        shard_video_block_fn(core, filt, mesh)(pt, pt)


def test_batch_scorer_sharded_over_pairs():
    """A batch of independent image pairs sharded over the 'data' axis must
    reproduce per-pair single-device JODs."""
    core = _make_core()
    import __graft_entry__ as ge
    from fovvideovdp_tpu.utils import config_files, json2dict
    from fovvideovdp_tpu.parallel import make_batch_scorer
    from fovvideovdp_tpu.ops import masking as mask_ops

    params = json2dict(config_files.find("fvvdp_parameters.json"))
    mesh = make_mesh(_cpu_devices(8), data_parallel=8)
    fn = make_batch_scorer(core, mesh, params)

    rng = np.random.RandomState(0)
    N = 8
    refs = jnp.asarray(rng.rand(N, 48, 64).astype(np.float32) * 150 + 0.5)
    tests = refs + jnp.asarray(rng.randn(N, 48, 64).astype(np.float32))
    Q = np.asarray(fn(tests, refs))
    assert Q.shape == (N,)
    assert np.isfinite(Q).all() and (Q <= 10).all()

    # single-device per-pair check
    img_fn = core.image_fn()
    for i in [0, 3, 7]:
        Qc, _ = img_fn(tests[i], refs[i])
        Qi = float(mask_ops.pool_to_jod(
            Qc, params["w_transient"], params["beta_sch"], params["beta_tch"],
            params["beta_t"], params["jod_a"], params["log_jod_exp"]))
        np.testing.assert_allclose(Q[i], Qi, rtol=1e-5, atol=1e-5)


def test_predict_batch_matches_predict():
    """predict_batch over the CPU mesh must equal per-pair predict."""
    from fovvideovdp_tpu import fvvdp

    rng = np.random.RandomState(9)
    N, F, H, W = 3, 4, 32, 48
    ref = (rng.rand(N, H, W, 3, F) * 255).astype(np.uint8)
    tst = np.clip(ref.astype(np.int16) + rng.randint(-20, 20, ref.shape),
                  0, 255).astype(np.uint8)

    fv = fvvdp(display_name="standard_fhd")
    jods, stats = fv.predict_batch(tst, ref, dim_order="BHWCF",
                                   frames_per_second=30)
    assert jods.shape == (N,) and stats["Q_per_ch"].shape[2] == N

    for i in range(N):
        Qi, _ = fv.predict(tst[i], ref[i], dim_order="HWCF",
                           frames_per_second=30)
        np.testing.assert_allclose(jods[i], Qi, rtol=1e-5, atol=1e-4)

    # image batch path
    jods_img, _ = fv.predict_batch(tst[..., 0], ref[..., 0], dim_order="BHWC")
    for i in range(N):
        Qi, _ = fv.predict(tst[i, ..., 0], ref[i, ..., 0], dim_order="HWC")
        np.testing.assert_allclose(jods_img[i], Qi, rtol=1e-5, atol=1e-4)


def test_predict_batch_foveated_fixed_gaze():
    """Foveated predict_batch (one shared fixation point -> per-pixel CSF
    tables replicated across the mesh) must equal per-pair predict."""
    from fovvideovdp_tpu import fvvdp

    rng = np.random.RandomState(11)
    N, H, W = 3, 32, 48
    ref = (rng.rand(N, H, W, 3) * 255).astype(np.uint8)
    tst = np.clip(ref.astype(np.int16) + rng.randint(-25, 25, ref.shape),
                  0, 255).astype(np.uint8)
    gaze = np.asarray([10.0, 20.0], np.float32)  # off-centre fixed gaze

    fv = fvvdp(display_name="standard_hmd", foveated=True)
    jods, _ = fv.predict_batch(tst, ref, dim_order="BHWC",
                               fixation_point=gaze)
    assert jods.shape == (N,)
    for i in range(N):
        Qi, _ = fv.predict(tst[i], ref[i], dim_order="HWC",
                           fixation_point=gaze)
        np.testing.assert_allclose(jods[i], Qi, rtol=1e-5, atol=1e-4)

    # per-pair fixation points shard with their pairs (trilinear CSF path)
    per_pair = np.stack([np.linspace(5, W - 5, N),
                         np.linspace(5, H - 5, N)], axis=1).astype(np.float32)
    jods_pp, _ = fv.predict_batch(tst, ref, dim_order="BHWC",
                                  fixation_point=per_pair)
    for i in range(N):
        Qi, _ = fv.predict(tst[i], ref[i], dim_order="HWC",
                           fixation_point=per_pair[i])
        np.testing.assert_allclose(jods_pp[i], Qi, rtol=1e-5, atol=1e-4)

    # malformed gaze shapes are rejected loudly
    with pytest.raises(RuntimeError):
        fv.predict_batch(tst, ref, dim_order="BHWC",
                         fixation_point=np.zeros((N, 3), np.float32))
    with pytest.raises(RuntimeError):  # wrong pair count
        fv.predict_batch(tst, ref, dim_order="BHWC",
                         fixation_point=np.zeros((N + 1, 2), np.float32))


def test_predict_batch_foveated_moving_gaze_video():
    """(N, F, 2) per-frame gaze in a video batch equals per-pair predict
    with the same moving gaze."""
    from fovvideovdp_tpu import fvvdp

    rng = np.random.RandomState(13)
    N, F, H, W = 2, 4, 32, 48
    ref = (rng.rand(N, F, H, W, 3) * 255).astype(np.uint8)
    tst = np.clip(ref.astype(np.int16) + rng.randint(-25, 25, ref.shape),
                  0, 255).astype(np.uint8)
    gaze = rng.rand(N, F, 2).astype(np.float32) * [W - 1, H - 1]

    fv = fvvdp(display_name="standard_hmd", foveated=True)
    jods, _ = fv.predict_batch(tst, ref, dim_order="BFHWC",
                               frames_per_second=30, fixation_point=gaze)
    for i in range(N):
        Qi, _ = fv.predict(tst[i], ref[i], dim_order="FHWC",
                           frames_per_second=30, fixation_point=gaze[i])
        np.testing.assert_allclose(jods[i], Qi, rtol=1e-5, atol=1e-4)


def test_predict_mesh_streaming_matches_single():
    """predict(mesh=...) streams the video sharded over the mesh and must
    equal the single-device result — including non-divisible frame counts
    (block rounding + tail padding) and the heatmap."""
    from fovvideovdp_tpu import fvvdp
    from fovvideovdp_tpu.parallel import make_mesh

    rng = np.random.RandomState(3)
    F, H, W = 14, 32, 48
    ref = (rng.rand(F, H, W, 3) * 255).astype(np.uint8)
    tst = np.clip(ref.astype(np.int16) + rng.randint(-20, 20, ref.shape),
                  0, 255).astype(np.uint8)
    mesh = make_mesh()
    assert mesh.devices.size > 1

    fv = fvvdp(display_name="standard_fhd", heatmap="threshold",
               block_frames=7)  # rounds up to the 8-device mesh
    q1, s1 = fv.predict(tst, ref, dim_order="FHWC", frames_per_second=30)
    q2, s2 = fv.predict(tst, ref, dim_order="FHWC", frames_per_second=30,
                        mesh=mesh)
    np.testing.assert_allclose(q2, q1, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(s2["Q_per_ch"], s1["Q_per_ch"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s2["heatmap"], np.float32),
                               np.asarray(s1["heatmap"], np.float32),
                               atol=2e-3)

    # device-resident heatmaps stay sharded on the frame axis; values match
    fv_dev = fvvdp(display_name="standard_fhd", heatmap="threshold",
                   block_frames=7, device_heatmap=True)
    q3, s3 = fv_dev.predict(tst, ref, dim_order="FHWC", frames_per_second=30,
                            mesh=mesh)
    np.testing.assert_allclose(q3, q1, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s3["heatmap"], np.float32),
                               np.asarray(s1["heatmap"], np.float32),
                               atol=2e-3)


def test_predict_mesh_foveated_moving_gaze():
    """A moving gaze shards with its frames; a static fixation point uses the
    replicated per-pixel CSF tables.  Both must match single-device."""
    from fovvideovdp_tpu import fvvdp
    from fovvideovdp_tpu.parallel import make_mesh

    rng = np.random.RandomState(5)
    F, H, W = 8, 32, 48
    ref = (rng.rand(F, H, W, 3) * 255).astype(np.uint8)
    tst = np.clip(ref.astype(np.int16) + rng.randint(-25, 25, ref.shape),
                  0, 255).astype(np.uint8)
    gaze = np.stack([np.linspace(5, W - 5, F),
                     np.linspace(5, H - 5, F)], axis=1).astype(np.float32)
    mesh = make_mesh()

    fv = fvvdp(display_name="standard_hmd", foveated=True)
    for fp in (gaze, np.asarray([12.0, 7.0], np.float32)):
        q1, _ = fv.predict(tst, ref, dim_order="FHWC", frames_per_second=30,
                           fixation_point=fp)
        q2, _ = fv.predict(tst, ref, dim_order="FHWC", frames_per_second=30,
                           fixation_point=fp, mesh=mesh)
        np.testing.assert_allclose(q2, q1, rtol=1e-5, atol=1e-4)


def test_predict_mesh_single_image():
    """A lone image routes through the row-sharded scorer and a 1-device
    mesh falls back to the single-chip path."""
    from fovvideovdp_tpu import fvvdp
    from fovvideovdp_tpu.parallel import make_mesh
    import jax

    rng = np.random.RandomState(7)
    H, W = 48, 64
    ref = (rng.rand(H, W, 3) * 255).astype(np.uint8)
    tst = np.clip(ref.astype(np.int16) + rng.randint(-20, 20, ref.shape),
                  0, 255).astype(np.uint8)

    fv = fvvdp(display_name="standard_4k")
    q1, _ = fv.predict(tst, ref, dim_order="HWC")
    q2, _ = fv.predict(tst, ref, dim_order="HWC",
                       mesh=make_mesh(data_parallel=1))  # rows over 'space'
    np.testing.assert_allclose(q2, q1, rtol=1e-5, atol=1e-4)
    q3, _ = fv.predict(tst, ref, dim_order="HWC",
                       mesh=make_mesh(jax.devices("cpu")[:1]))
    np.testing.assert_allclose(q3, q1, rtol=1e-6, atol=1e-6)


def test_predict_mesh_takes_scan_path(monkeypatch):
    """With a mesh and a device-resident source the whole video scores
    through the sharded chunked scan (a handful of dispatches), matching
    the single-device result; FVVDP_DISABLE_SCAN falls back to the sharded
    streaming loop with identical numerics."""
    from fovvideovdp_tpu import fvvdp
    from fovvideovdp_tpu.parallel import make_mesh

    monkeypatch.delenv("FVVDP_DISABLE_SCAN", raising=False)
    monkeypatch.delenv("FVVDP_SCAN_MAX_BYTES", raising=False)
    monkeypatch.delenv("FVVDP_SCAN_HBM_CAP_BYTES", raising=False)

    rng = np.random.RandomState(11)
    F, H, W = 18, 32, 48
    ref = (rng.rand(F, H, W, 3) * 255).astype(np.uint8)
    tst = np.clip(ref.astype(np.int16) + rng.randint(-20, 20, ref.shape),
                  0, 255).astype(np.uint8)
    mesh = make_mesh()
    assert mesh.devices.size > 1

    fv = fvvdp(display_name="standard_fhd", block_frames=8)
    q1, s1 = fv.predict(tst, ref, dim_order="FHWC", frames_per_second=30)
    assert fv._exec_path == "scan"
    q2, s2 = fv.predict(tst, ref, dim_order="FHWC", frames_per_second=30,
                        mesh=mesh)
    assert fv._exec_path == "scan", "mesh scoring must use the sharded scan"
    np.testing.assert_allclose(q2, q1, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(s2["Q_per_ch"], s1["Q_per_ch"],
                               rtol=1e-4, atol=1e-5)

    monkeypatch.setenv("FVVDP_DISABLE_SCAN", "1")
    q3, _ = fv.predict(tst, ref, dim_order="FHWC", frames_per_second=30,
                       mesh=mesh)
    assert fv._exec_path == "stream"
    np.testing.assert_allclose(q3, q1, rtol=1e-5, atol=1e-4)


def test_predict_mesh_scan_foveated(monkeypatch):
    """Sharded scan with a moving gaze (gaze shards with its frames inside
    the scan body) and with a static fixation point (tables replicated,
    bound per call)."""
    from fovvideovdp_tpu import fvvdp
    from fovvideovdp_tpu.parallel import make_mesh

    monkeypatch.delenv("FVVDP_DISABLE_SCAN", raising=False)
    rng = np.random.RandomState(13)
    F, H, W = 16, 32, 48
    ref = (rng.rand(F, H, W, 3) * 255).astype(np.uint8)
    tst = np.clip(ref.astype(np.int16) + rng.randint(-25, 25, ref.shape),
                  0, 255).astype(np.uint8)
    gaze = np.stack([np.linspace(5, W - 5, F),
                     np.linspace(5, H - 5, F)], axis=1).astype(np.float32)
    mesh = make_mesh()

    fv = fvvdp(display_name="standard_hmd", foveated=True, block_frames=8)
    for fp in (gaze, np.asarray([12.0, 7.0], np.float32)):
        q1, _ = fv.predict(tst, ref, dim_order="FHWC", frames_per_second=30,
                           fixation_point=fp)
        path1 = fv._exec_path
        q2, _ = fv.predict(tst, ref, dim_order="FHWC", frames_per_second=30,
                           fixation_point=fp, mesh=mesh)
        assert fv._exec_path == "scan" == path1
        np.testing.assert_allclose(q2, q1, rtol=1e-5, atol=1e-4)
