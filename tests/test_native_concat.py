"""Native MP4 stream-copy concatenation.

The ffmpeg-less replacement for the reference's concat-demuxer join
(/root/reference/VRGDG_StandaloneVideoEnhancerNodes.py:444-510): merged
sample tables, byte-identical payload copy, no re-encode.
"""

import os
import shutil

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vrgdg_tpu import native
from vrgdg_tpu.runtime import video_io

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")


def _write_segment(path, n_frames, size=(64, 48), fps=24.0, seed=0):
    rng = np.random.default_rng(seed)
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, size)
    assert writer.isOpened()
    frames = []
    for _ in range(n_frames):
        frame = rng.integers(0, 255, (size[1], size[0], 3), np.uint8)
        writer.write(frame)
        frames.append(frame)
    writer.release()
    return frames


def _decode(path):
    capture = cv2.VideoCapture(str(path))
    frames = []
    while True:
        ok, frame = capture.read()
        if not ok:
            break
        frames.append(frame)
    capture.release()
    return frames


@pytest.fixture()
def segments(tmp_path):
    paths = []
    for k, n in enumerate([13, 7, 21]):
        p = tmp_path / f"seg{k:04d}.mp4"
        _write_segment(p, n, seed=k)
        paths.append(str(p))
    return paths


def test_stream_copy_concat(segments, tmp_path):
    out = str(tmp_path / "joined.mp4")
    native.concat_mp4_stream_copy(segments, out)
    meta = video_io.probe_video(out)
    assert meta["frame_count"] == 41
    assert (meta["width"], meta["height"]) == (64, 48)
    assert meta["fps"] == pytest.approx(24.0)
    # lossless: decoded frames byte-identical to decoding each segment
    reference = [f for p in segments for f in _decode(p)]
    joined = _decode(out)
    assert len(joined) == len(reference)
    assert all(np.array_equal(a, b) for a, b in zip(reference, joined))


def test_single_input_roundtrip(segments, tmp_path):
    out = str(tmp_path / "one.mp4")
    native.concat_mp4_stream_copy(segments[:1], out)
    assert video_io.probe_video(out)["frame_count"] == 13
    assert all(np.array_equal(a, b)
               for a, b in zip(_decode(segments[0]), _decode(out)))


def test_dimension_mismatch_rejected(segments, tmp_path):
    odd = tmp_path / "odd.mp4"
    _write_segment(odd, 5, size=(32, 32))
    with pytest.raises(ValueError, match="differs|mismatch"):
        native.concat_mp4_stream_copy(segments + [str(odd)],
                                      str(tmp_path / "bad.mp4"))


def test_garbage_input_rejected(tmp_path):
    junk = tmp_path / "junk.mp4"
    junk.write_bytes(b"not an mp4 at all" * 10)
    with pytest.raises(ValueError):
        native.concat_mp4_stream_copy([str(junk)], str(tmp_path / "o.mp4"))


def test_concat_videos_prefers_native(segments, tmp_path, monkeypatch):
    # Without ffmpeg, concat_videos should take the lossless native path.
    monkeypatch.setattr(video_io, "find_ffmpeg", lambda: None)
    out = str(tmp_path / "final.mp4")
    result = video_io.concat_videos(segments, out, 24.0, 64, 48,
                                    preserve_audio=False)
    assert result == {"backend": "native:mp4concat", "audio": False}
    assert video_io.probe_video(out)["frame_count"] == 41


def test_concat_videos_falls_back_on_mismatch(tmp_path, monkeypatch):
    # Mixed dimensions: native refuses, cv2 re-encode takes over and
    # resizes — same degradation the pure-Python path always had.
    monkeypatch.setattr(video_io, "find_ffmpeg", lambda: None)
    a, b = tmp_path / "a.mp4", tmp_path / "b.mp4"
    _write_segment(a, 6, size=(64, 48))
    _write_segment(b, 4, size=(32, 32))
    out = str(tmp_path / "final.mp4")
    result = video_io.concat_videos([str(a), str(b)], out, 24.0, 64, 48,
                                    preserve_audio=False)
    assert result["backend"].startswith("cv2:")
    assert video_io.probe_video(out)["frame_count"] == 10


def test_native_unavailable_degrades(tmp_path, monkeypatch, segments):
    # Simulate a host with no compiler: the loader raises
    # NativeUnavailable and concat_videos still produces output via cv2.
    def boom(name):
        raise native.NativeUnavailable("no compiler")

    monkeypatch.setattr(native, "load", boom)
    monkeypatch.setattr(video_io, "find_ffmpeg", lambda: None)
    out = str(tmp_path / "final.mp4")
    result = video_io.concat_videos(segments, out, 24.0, 64, 48,
                                    preserve_audio=False)
    assert result["backend"].startswith("cv2:")
    assert video_io.probe_video(out)["frame_count"] == 41


def test_malformed_esds_descriptor_terminates(tmp_path):
    # Regression: a descriptor chain not starting with tag 0x03 once made
    # normalize_stsd loop forever. Patch the tag byte in both segments
    # (identically, so the stsd comparison is still consistent) and
    # require prompt completion — success or clean ValueError, no hang.
    paths = []
    for k in range(2):
        p = tmp_path / f"seg{k}.mp4"
        _write_segment(p, 6, seed=k)
        blob = bytearray(p.read_bytes())
        i = blob.rfind(b"esds")
        assert i > 0
        assert blob[i + 8] == 0x03  # ES_Descriptor tag
        blob[i + 8] = 0x07          # unknown tag: normalization must bail
        p.write_bytes(bytes(blob))
        paths.append(str(p))
    out = str(tmp_path / "joined.mp4")
    try:
        native.concat_mp4_stream_copy(paths, out)
        assert video_io.probe_video(out)["frame_count"] == 12
    except ValueError:
        pass  # clean refusal is acceptable; hanging is not


def test_truncation_fuzz_never_hangs(tmp_path):
    # Feed the parser systematically truncated valid files: every
    # prefix length across box boundaries must produce success or a
    # clean ValueError within the test timeout — no hang, no crash.
    src = tmp_path / "whole.mp4"
    _write_segment(src, 8, seed=9)
    blob = src.read_bytes()
    cuts = sorted({16, 64, len(blob) // 4, len(blob) // 2,
                   len(blob) - 2048, len(blob) - 512, len(blob) - 64,
                   len(blob) - 9, len(blob) - 1})
    for k, cut in enumerate(cuts):
        p = tmp_path / f"cut{k}.mp4"
        p.write_bytes(blob[:max(0, cut)])
        try:
            native.concat_mp4_stream_copy([str(p)],
                                          str(tmp_path / f"o{k}.mp4"))
        except ValueError:
            pass


def test_bitflip_fuzz_in_moov(tmp_path):
    # Corrupt single bytes throughout the moov (sizes, counts, offsets):
    # the parser must reject or succeed cleanly every time.
    src = tmp_path / "whole.mp4"
    _write_segment(src, 8, seed=10)
    blob = bytearray(src.read_bytes())
    moov_at = blob.rfind(b"moov") - 4
    assert moov_at > 0
    for k, delta in enumerate(range(0, len(blob) - moov_at - 1, 61)):
        mutated = bytearray(blob)
        mutated[moov_at + delta] ^= 0xFF
        p = tmp_path / f"mut{k}.mp4"
        p.write_bytes(bytes(mutated))
        try:
            native.concat_mp4_stream_copy([str(p)],
                                          str(tmp_path / f"m{k}.mp4"))
        except ValueError:
            pass
