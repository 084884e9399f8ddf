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


def _spawn_byte_producer(py_body):
    import subprocess
    import sys
    return subprocess.Popen([sys.executable, "-c", py_body],
                            stdout=subprocess.PIPE)


def test_pipe_reader_streams_and_eof(tmp_path):
    """Frames stream through the ring in order; a partial trailing frame is
    dropped at EOF; reads past EOF return empty."""
    if native.load() is None:
        pytest.skip("no C++ toolchain")
    fb = 1000
    n = 25
    p = _spawn_byte_producer(
        "import sys\n"
        f"data = bytes((i * 7 + j) % 256 for i in range({n}) "
        f"for j in range({fb}))\n"
        "sys.stdout.buffer.write(data + b'\\x42' * 17)\n")  # + partial frame
    r = native.NativePipeReader(p.stdout.fileno(), fb, ring_frames=4)
    got = [r.read_block(7) for _ in range(5)]
    expect = np.array([[(i * 7 + j) % 256 for j in range(fb)]
                       for i in range(n)], dtype=np.uint8)
    np.testing.assert_array_equal(np.concatenate(got[:4]), expect)
    assert got[4].shape[0] == 0  # EOF; the 17 trailing bytes are dropped
    p.kill()
    r.close()
    p.stdout.close()
    p.wait()


def test_pipe_reader_prefetches_ahead(tmp_path):
    """The background drain lets a producer finish writing MORE than the
    kernel pipe capacity while the consumer reads nothing — the overlap the
    synchronous Python reads cannot provide."""
    if native.load() is None:
        pytest.skip("no C++ toolchain")
    import time
    fb = 1 << 20  # 1 MB frames >> 64 KB kernel pipe
    done = tmp_path / "done"
    p = _spawn_byte_producer(
        "import sys\n"
        f"sys.stdout.buffer.write(b'\\xab' * ({fb} * 3))\n"
        "sys.stdout.buffer.flush()\n"
        f"open({str(done)!r}, 'w').close()\n")
    r = native.NativePipeReader(p.stdout.fileno(), fb, ring_frames=4)
    deadline = time.time() + 30
    while not done.exists() and time.time() < deadline:
        time.sleep(0.02)  # consumer idle: only the ring can absorb 3 MB
    assert done.exists(), "producer stalled: pipe was not drained ahead"
    blk = r.read_block(3)
    assert blk.shape == (3, fb) and (blk == 0xAB).all()
    p.kill()
    r.close()
    p.stdout.close()
    p.wait()


def test_video_reader_uses_native_pipe(tmp_path, monkeypatch):
    """video_reader engages the native drain when the library is available."""
    if native.load() is None:
        pytest.skip("no C++ toolchain")
    import os
    import stat
    import sys
    import json
    bindir = tmp_path / "bin"
    bindir.mkdir()
    H, W, F = 24, 32, 4
    raw = np.arange(H * W * 3 * F, dtype=np.uint8).reshape(F, -1) % 251
    vid = tmp_path / "v.mp4"
    vid.write_bytes(raw.tobytes())
    probe = {"streams": [{"codec_type": "video", "width": W, "height": H,
                          "pix_fmt": "rgb24", "nb_frames": str(F),
                          "r_frame_rate": "30/1"}]}
    (tmp_path / "v.mp4.probe.json").write_text(json.dumps(probe))
    for name, body in (
            ("ffprobe", "import sys\n"
                        "print(open(sys.argv[-1] + '.probe.json').read())\n"),
            ("ffmpeg", "import sys\n"
                       "path = sys.argv[sys.argv.index('-i') + 1]\n"
                       "sys.stdout.buffer.write(open(path, 'rb').read())\n")):
        exe = bindir / name
        exe.write_text(f"#!{sys.executable}\n{body}")
        os.chmod(exe, os.stat(exe).st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}{os.pathsep}{os.environ['PATH']}")

    from fovvideovdp_tpu.video_source_file import video_reader
    vr = video_reader(str(vid))
    blk = vr.get_frames_block(F)
    np.testing.assert_array_equal(blk, raw)
    assert vr._pipe, "native pipe reader was not engaged"
    vr.close()


def test_yuvreader_uses_native(yuv_file):
    path, frames = yuv_file
    from fovvideovdp_tpu.video_source_yuv import YUVReader
    r = YUVReader(path)
    blk = r.read_raw_block(0, 2)
    np.testing.assert_array_equal(blk, frames[:2])
    if native.load() is not None:
        assert r.native is not None


def test_native_reader_prefetch_race(tmp_path):
    """Every delivered frame must carry ITS OWN bytes while the prefetch
    worker runs concurrently.  (The reader once shared one FILE* position
    between the worker and fetch(); interleaved seeks silently delivered the
    wrong frame — POSIX pread carries its own offset.)"""
    if native.load() is None:
        pytest.skip("no C++ toolchain")
    H, W, F = 16, 64, 64
    fname = tmp_path / f"clip_{W}x{H}_8b_420_709_30fps.yuv"
    fpx = W * H * 3 // 2
    with open(fname, "wb") as f:
        for i in range(F):  # frame i = constant byte i
            f.write(np.full(fpx, i, dtype=np.uint8).tobytes())
    r = native.NativeYuvReader(str(fname), W, H, 8, "420")
    rng = np.random.RandomState(1)
    for _ in range(20):  # mixed sequential + random access, racing prefetch
        start = int(rng.randint(0, F - 4))
        blk = r.read_block(start, 4)
        for k in range(4):
            assert (blk[k] == start + k).all(), \
                f"frame {start + k} delivered foreign bytes"
        idx = [int(i) for i in rng.randint(0, F, 3)]
        got = r.read_indices(idx)
        for k, i in enumerate(idx):
            assert (got[k] == i).all(), f"frame {i} delivered foreign bytes"
    r.close()
