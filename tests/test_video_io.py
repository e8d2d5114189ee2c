import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vrgdg_tpu.runtime import video_io as vio


@pytest.fixture(scope="module")
def sample_video(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "sample.mp4")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 12.0,
                             (64, 48))
    assert writer.isOpened()
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (20, 48, 64, 3), np.uint8)
    for frame in frames:
        writer.write(frame)
    writer.release()
    return path


def test_probe(sample_video):
    meta = vio.probe_video(sample_video)
    assert meta["width"] == 64 and meta["height"] == 48
    assert meta["frame_count"] == 20
    assert abs(meta["fps"] - 12.0) < 1e-3
    assert meta["duration"] > 1.5


def test_probe_rejects_bad_paths(tmp_path):
    with pytest.raises(FileNotFoundError):
        vio.probe_video(str(tmp_path / "missing.mp4"))
    bad = tmp_path / "file.txt"
    bad.write_text("x")
    with pytest.raises(ValueError, match="Unsupported"):
        vio.probe_video(str(bad))


def test_safe_name():
    assert vio.safe_name("../../etc/passwd") == "passwd"
    assert vio.safe_name("my video!.mp4") == "my_video.mp4"
    assert vio.safe_name("", "fallback") == "fallback"


def test_reader_batches_and_ranges(sample_video):
    with vio.VideoReader(sample_video, batch_size=8) as reader:
        batches = list(reader)
    starts = [s for s, _ in batches]
    sizes = [b.shape[0] for _, b in batches]
    assert starts == [0, 8, 16]
    assert sizes == [8, 8, 4]
    assert batches[0][1].dtype == np.float32
    assert batches[0][1].max() <= 1.0

    with vio.VideoReader(sample_video, batch_size=4, start_frame=10,
                         end_frame=15) as reader:
        seg = list(reader)
    assert [s for s, _ in seg] == [10, 14]
    assert sum(b.shape[0] for _, b in seg) == 5


def test_prefetching_reader_matches_direct(sample_video):
    with vio.VideoReader(sample_video, batch_size=6) as reader:
        direct = list(reader)
    pre = list(vio.PrefetchingReader(vio.VideoReader(sample_video, batch_size=6)))
    assert len(direct) == len(pre)
    for (s1, b1), (s2, b2) in zip(direct, pre):
        assert s1 == s2
        np.testing.assert_array_equal(b1, b2)


def test_round_trip_conversion():
    rng = np.random.default_rng(1)
    array = rng.uniform(0, 1, (3, 8, 8, 3)).astype(np.float32)
    frames = vio.array_to_frames(array)
    back = vio.frames_to_array(frames)
    assert np.max(np.abs(back - array)) <= (1.0 / 255.0)


def test_writer_fallback_and_validation(tmp_path):
    path = str(tmp_path / "out.mp4")
    rng = np.random.default_rng(2)
    batches = [rng.uniform(0, 1, (5, 32, 48, 3)).astype(np.float32)]
    codec = vio.write_video_with_fallback(
        path, 10.0, 48, 32, lambda: iter(batches))
    assert codec in vio.CODEC_CANDIDATES
    assert vio.validate_video_readable(path)
    meta = vio.probe_video(path)
    assert meta["frame_count"] == 5


def test_concat_without_ffmpeg(tmp_path, sample_video, monkeypatch):
    # ffmpeg absent: compatible mp4 segments take the lossless native
    # stream-copy path (cv2 re-encode only when that refuses or can't
    # build — forced-degradation cases live in tests/test_native_concat).
    seg2 = str(tmp_path / "seg2.mp4")
    rng = np.random.default_rng(3)
    vio.write_video_with_fallback(
        seg2, 12.0, 64, 48,
        lambda: iter([rng.uniform(0, 1, (4, 48, 64, 3)).astype(np.float32)]))
    out = str(tmp_path / "final.mp4")
    monkeypatch.setattr(vio, "find_ffmpeg", lambda: None)
    result = vio.concat_videos([sample_video, seg2], out, 12.0, 64, 48)
    assert result["backend"] in {"native:mp4concat", "cv2:mp4v"}
    meta = vio.probe_video(out)
    assert meta["frame_count"] == 24


def test_parallel_reader_matches_sequential(tmp_path):
    import numpy as np

    path = str(tmp_path / "par.mp4")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10.0,
                             (64, 48))
    rng = np.random.default_rng(5)
    for _ in range(53):  # deliberately not a multiple of batch/chunk
        writer.write(rng.integers(0, 255, (48, 64, 3), np.uint8))
    writer.release()

    def collect(reader):
        out = []
        with reader:
            for start, batch in reader:
                out.append((start, batch))
        return out

    for start_frame, end_frame in ((0, None), (7, 41), (0, 53)):
        seq = collect(vio.VideoReader(path, batch_size=6,
                                      start_frame=start_frame,
                                      end_frame=end_frame))
        for workers in (2, 4):
            par = collect(vio.ParallelVideoReader(
                path, batch_size=6, start_frame=start_frame,
                end_frame=end_frame, workers=workers, chunk_batches=2))
            assert [s for s, _ in par] == [s for s, _ in seq]
            for (_, a), (_, b) in zip(par, seq):
                np.testing.assert_array_equal(a, b)


def test_parallel_reader_detects_misaligned_seeks(tmp_path):
    # Simulate a backend whose CAP_PROP_POS_FRAMES seeks land one frame
    # late (the open-GOP/B-frame failure mode from the round-2 advisory):
    # build the reader with a chunk grid shifted by one frame, so each
    # worker's pre-frame probe cannot match the previous chunk's last
    # frame. The iterator must raise, never silently misalign output.
    import threading

    import numpy as np

    path = str(tmp_path / "mis.mp4")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10.0,
                             (64, 48))
    rng = np.random.default_rng(6)
    for _ in range(53):
        writer.write(rng.integers(0, 255, (48, 64, 3), np.uint8))
    writer.release()

    reader = vio.ParallelVideoReader.__new__(vio.ParallelVideoReader)
    reader.path = path
    reader.batch_size = 8
    reader.as_float = False
    reader.start_frame = 0
    reader.end_frame = 53
    reader.workers = 2
    reader.verify_seeks = True
    reader.chunk_frames = 16
    reader._stop = threading.Event()
    reader._results = {}
    reader._error = None
    reader._lock = threading.Lock()
    reader._ready = threading.Condition(reader._lock)
    reader._chunks = [0, 17, 33, 49]  # chunk 1 starts one frame late
    reader._next_chunk = 0
    reader._threads = [threading.Thread(target=reader._worker, daemon=True)
                       for _ in range(2)]
    for thread in reader._threads:
        thread.start()
    with pytest.raises(RuntimeError, match="misalignment"):
        for _ in reader:
            pass
    reader.close()


def test_parallel_reader_early_close(tmp_path):
    import numpy as np

    path = str(tmp_path / "parclose.mp4")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10.0,
                             (64, 48))
    rng = np.random.default_rng(6)
    for _ in range(40):
        writer.write(rng.integers(0, 255, (48, 64, 3), np.uint8))
    writer.release()
    reader = vio.ParallelVideoReader(path, batch_size=4, workers=3)
    iterator = iter(reader)
    next(iterator)
    reader.close()  # must stop and join workers without hanging


def test_parallel_reader_worker_failure_raises(tmp_path, monkeypatch):
    """A worker that cannot open its capture must surface an error to the
    consumer promptly instead of hanging or silently truncating."""
    import numpy as np

    path = str(tmp_path / "parfail.mp4")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10.0,
                             (64, 48))
    rng = np.random.default_rng(8)
    for _ in range(20):
        writer.write(rng.integers(0, 255, (48, 64, 3), np.uint8))
    writer.release()

    real_capture = cv2.VideoCapture
    created = {"count": 0}

    class FailingCapture:
        def __init__(self, *args):
            created["count"] += 1
            self._real = None

        def isOpened(self):
            return False

        def release(self):
            pass

    # the constructor probe (frame count) must still work; fail only the
    # worker-side captures created afterwards
    def capture_factory(*args):
        if created["count"] == 0:
            created["count"] += 1
            return real_capture(*args)
        return FailingCapture(*args)

    monkeypatch.setattr(cv2, "VideoCapture", capture_factory)
    reader = vio.ParallelVideoReader(path, batch_size=4, workers=2)
    with pytest.raises(RuntimeError, match="worker"):
        list(iter(reader))
    reader.close()
