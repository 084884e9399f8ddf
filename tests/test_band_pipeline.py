"""Parity of the fully-fused per-level scorer (ops/pallas/band_pipeline.py)
against the jnp composition, and of the no-pre-pad reduce fast path.

Runs through the Pallas interpreter on CPU (the suite's default platform),
exercising the same pallas_call graph real hardware compiles; the on-TPU
equivalents live in tests/test_pallas_kernels.py and tests/test_tpu_e2e.py.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fovvideovdp_tpu.ops import pallas as pallas_cfg


def _core(w, h):
    import __graft_entry__ as ge
    return ge._make_core(w, h)


@pytest.mark.parametrize("shape", [(96, 144), (67, 131), (160, 384),
                                   (112, 384), (72, 384),
                                   # direct-coarse mode (raw coarse DMA,
                                   # w2 % 128 == 0): even/odd H fringe
                                   (96, 256), (67, 256), (72, 512)])
def test_fused_score_path_matches_jnp(shape):
    """score_frames fused path (interpret Pallas) == unfused jnp path."""
    H, W = shape
    core = _core(W, H)
    rng = np.random.default_rng(3)
    R = jnp.asarray(rng.random((2, 4, H, W), dtype=np.float32) * 80 + 0.5)
    with pallas_cfg.forced(False):
        want, _ = jax.jit(lambda r: core.score_frames(r, None, temp_ch=2))(R)
    with pallas_cfg.forced(True, interpret=True):
        got, _ = jax.jit(lambda r: core.score_frames(r, None, temp_ch=2))(R)
    rel = np.max(np.abs(np.asarray(want) - np.asarray(got))
                 / (np.abs(np.asarray(want)) + 1e-9))
    assert rel < 1e-4, f"fused path rel err {rel}"


def test_expand_score2_gradient_matches_jnp():
    """The custom VJP (jnp recomputation) must match differentiating the jnp
    composition directly."""
    from fovvideovdp_tpu.ops.pallas import band_pipeline as bp
    core = _core(128, 96)
    p = core.params
    rng = np.random.default_rng(4)
    gf = jnp.asarray(rng.random((1, 4, 96, 128), dtype=np.float32) * 50 + 0.5)
    gc = jnp.asarray(rng.random((1, 4, 48, 64), dtype=np.float32) * 50 + 0.5)
    tabs = np.stack(core._band_tables[0][:2])

    def loss(a, b):
        s = bp.expand_score2(a, b, tabs, core.luts[0], p["mask_p"],
                             p["mask_q_sust"], p["mask_q_trans"], p["mask_c"],
                             1.0, p["beta"])
        return jnp.sum(s)

    with pallas_cfg.forced(True, interpret=True):
        g1 = jax.grad(loss, argnums=(0, 1))(gf, gc)
    with pallas_cfg.forced(False):
        g2 = jax.grad(loss, argnums=(0, 1))(gf, gc)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


@pytest.mark.parametrize("shape", [(2160, 3840), (1080, 1920), (544, 1280),
                                   (200, 384), (136, 384)])
def test_reduce_nopad_matches_jnp(shape):
    """The no-pre-pad reduce (8-aligned heights) must equal the jnp path,
    including the folded mirror/edge matrices."""
    from fovvideovdp_tpu.ops.pyramid import _gausspyr_reduce_jnp
    from fovvideovdp_tpu.ops.pallas.reduce import (gausspyr_reduce_pallas,
                                                   _nopad_geometry)
    H, W = shape
    assert _nopad_geometry(H, W) is not None, "shape should take the fast path"
    # scale H/W down for interpret-mode runtime while keeping the geometry
    # class (the two biggest shapes run on real hardware in
    # test_pallas_kernels.py); here only the small ones execute
    if H > 600:
        pytest.skip("interpret-mode run too slow; covered on TPU")
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((2, H, W), dtype=np.float32) * 100)
    want = np.asarray(_gausspyr_reduce_jnp(x))
    with pallas_cfg.forced(True, interpret=True):
        got = np.asarray(gausspyr_reduce_pallas(x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_trim_lut_range_preserves_interpolation():
    """Trimmed tables + lut must give the same S_log as the full grid for
    every background luminance in the achievable [0.1, peak] range."""
    from fovvideovdp_tpu import csf as csf_mod
    core = _core(128, 96)
    full_tab = np.stack(core._band_tables[0][:2])
    trimmed, lut2 = csf_mod.trim_lut_range(full_tab, core.luts[0],
                                           lbkg_max=200.0)
    assert trimmed.shape[1] < full_tab.shape[1], "nothing was trimmed"
    L = jnp.asarray(np.geomspace(0.1, 200.0, 777, dtype=np.float32))
    s_full = csf_mod.sensitivity_1d(core.luts[0], full_tab[0], L)
    s_trim = csf_mod.sensitivity_1d(lut2, trimmed[0], L)
    np.testing.assert_allclose(np.asarray(s_trim), np.asarray(s_full),
                               rtol=2e-5)
    # out-of-range L must still clamp sanely (no NaN/inf)
    s_edge = csf_mod.sensitivity_1d(lut2, trimmed[0],
                                    jnp.asarray([1e-4, 1e6], jnp.float32))
    assert np.all(np.isfinite(np.asarray(s_edge)))


def test_temporal_block_split_invariance():
    """Oversized frame blocks split inside temporal_channels; outputs must be
    identical to the unsplit jnp computation."""
    from fovvideovdp_tpu.ops import temporal as t
    rng = np.random.default_rng(6)
    F = t.temporal_filters(30.0, 8)
    pt = jnp.asarray(rng.random((23, 48, 128), dtype=np.float32) * 100)
    pr = jnp.asarray(rng.random((23, 48, 128), dtype=np.float32) * 100)
    want = np.asarray(t.temporal_channels(pt, pr, F))
    # force the split threshold down so the small test block splits
    import fovvideovdp_tpu.ops.temporal as tmod
    src_fn = tmod.temporal_channels
    Rt = t.apply_temporal_filters(pt, jnp.asarray(F))
    Rr = t.apply_temporal_filters(pr, jnp.asarray(F))
    ref = np.asarray(jnp.stack([Rt[:, 0], Rr[:, 0], Rt[:, 1], Rr[:, 1]],
                               axis=1))
    np.testing.assert_allclose(want, ref, rtol=1e-5, atol=1e-4)
    half = 8
    fl = F.shape[1]
    a = t.temporal_channels(pt[:half + fl - 1], pr[:half + fl - 1], F)
    b = t.temporal_channels(pt[half:], pr[half:], F)
    split = np.asarray(jnp.concatenate([a, b], axis=0))
    np.testing.assert_allclose(split, ref, rtol=1e-5, atol=1e-4)


def test_temporal_pair_matches_concat():
    """temporal_channels_pair (split carry/new inputs, Pallas interpret and
    jnp fallback) must equal temporal_channels on the concatenation."""
    from fovvideovdp_tpu.ops import temporal as t
    rng = np.random.default_rng(7)
    F = t.temporal_filters(30.0, 8)
    fl = F.shape[1]
    B = 6
    ct = jnp.asarray(rng.random((fl - 1, 48, 128), dtype=np.float32) * 100)
    cr = jnp.asarray(rng.random((fl - 1, 48, 128), dtype=np.float32) * 100)
    nt = jnp.asarray(rng.random((B, 48, 128), dtype=np.float32) * 100)
    nr = jnp.asarray(rng.random((B, 48, 128), dtype=np.float32) * 100)
    want = np.asarray(t.temporal_channels(jnp.concatenate([ct, nt]),
                                          jnp.concatenate([cr, nr]), F))
    got_jnp = np.asarray(t.temporal_channels_pair(ct, nt, cr, nr, F))
    np.testing.assert_allclose(got_jnp, want, rtol=1e-5, atol=1e-4)
    with pallas_cfg.forced(True, interpret=True):
        got_pl = np.asarray(t.temporal_channels_pair(ct, nt, cr, nr, F))
    np.testing.assert_allclose(got_pl, want, rtol=1e-5, atol=1e-4)


def test_temporal_pair_chunked_split(monkeypatch):
    """With the VMEM budget shrunk, the pair kernel must split the block
    over output frames: several chunks that concatenate to the reference
    (the streaming step scores each chunk separately)."""
    from fovvideovdp_tpu.ops import temporal as t
    rng = np.random.default_rng(11)
    F = t.temporal_filters(30.0, 8)
    fl = F.shape[1]
    B = 7
    ct = jnp.asarray(rng.random((fl - 1, 16, 128), dtype=np.float32) * 100)
    cr = jnp.asarray(rng.random((fl - 1, 16, 128), dtype=np.float32) * 100)
    nt = jnp.asarray(rng.random((B, 16, 128), dtype=np.float32) * 100)
    nr = jnp.asarray(rng.random((B, 16, 128), dtype=np.float32) * 100)
    want = np.asarray(t.temporal_channels(jnp.concatenate([ct, nt]),
                                          jnp.concatenate([cr, nr]), F))
    monkeypatch.setattr(t, "_VMEM_SPLIT_BYTES", 1 << 16)
    with pallas_cfg.forced(True, interpret=True):
        chunks = t.temporal_channels_pair_chunks(ct, nt, cr, nr, F)
    assert len(chunks) > 1
    assert sum(c.shape[0] for c in chunks) == B
    got = np.concatenate([np.asarray(c) for c in chunks], axis=0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_streaming_step_chunked_scoring(goldens, monkeypatch):
    """The streaming step must give the golden JOD when the temporal kernel
    splits the block into chunks scored separately (core.py wires the
    per-chunk partial concatenation)."""
    from fovvideovdp_tpu import fvvdp
    from fovvideovdp_tpu.ops import temporal as t
    g = goldens("video_path_replicate")
    monkeypatch.setattr(t, "_VMEM_SPLIT_BYTES", 1 << 16)
    with pallas_cfg.forced(True, interpret=True):
        fv = fvvdp(display_name="standard_fhd", block_frames=8)
        Q, stats = fv.predict(g["test"], g["ref"], dim_order="HWCF",
                              frames_per_second=float(g["fps"]))
    assert abs(Q - float(g["Q_jod"])) <= 0.01
    np.testing.assert_allclose(stats["Q_per_ch"], g["Q_per_ch"], rtol=2e-3,
                               atol=2e-4)
