"""Native host-I/O library: prefetching YUV reads must match numpy memmap."""
import numpy as np
import pytest

from fovvideovdp_tpu import native


@pytest.fixture
def yuv_file(tmp_path):
    rng = np.random.RandomState(0)
    H, W, F = 32, 48, 6
    fname = tmp_path / f"clip_{W}x{H}_10b_420_709_30fps.yuv"
    frames = []
    with open(fname, "wb") as f:
        for _ in range(F):
            y = rng.randint(0, 1023, (H, W), dtype=np.uint16)
            u = rng.randint(0, 1023, (H // 2, W // 2), dtype=np.uint16)
            v = rng.randint(0, 1023, (H // 2, W // 2), dtype=np.uint16)
            for p in (y, u, v):
                f.write(p.tobytes())
            frames.append(np.concatenate([y.ravel(), u.ravel(), v.ravel()]))
    return str(fname), np.stack(frames)


def test_native_read_block(yuv_file):
    path, frames = yuv_file
    if native.load() is None:
        pytest.skip("no C++ toolchain")
    r = native.NativeYuvReader(path, 48, 32, 10, "420")
    assert r.frame_count == 6
    blk = r.read_block(1, 3)
    np.testing.assert_array_equal(blk, frames[1:4])
    # random access (circular-padding pattern)
    idx = r.read_indices([5, 0, 3])
    np.testing.assert_array_equal(idx, frames[[5, 0, 3]])
    # sequential again after the seek
    blk2 = r.read_block(0, 6)
    np.testing.assert_array_equal(blk2, frames)
    r.close()


def test_native_out_of_range(yuv_file):
    path, _ = yuv_file
    if native.load() is None:
        pytest.skip("no C++ toolchain")
    r = native.NativeYuvReader(path, 48, 32, 10, "420")
    with pytest.raises(RuntimeError):
        r.read_block(4, 5)  # past EOF
    r.close()


def test_yuvreader_uses_native(yuv_file):
    path, frames = yuv_file
    from fovvideovdp_tpu.video_source_yuv import YUVReader
    r = YUVReader(path)
    blk = r.read_raw_block(0, 2)
    np.testing.assert_array_equal(blk, frames[:2])
    if native.load() is not None:
        assert r.native is not None
