import os
import time

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vrgdg_tpu.core.params import EnhancerSettings
from vrgdg_tpu.jobs import enhancer as enh
from vrgdg_tpu.jobs import manifest as mf
from vrgdg_tpu.runtime import video_io as vio


@pytest.fixture()
def registry():
    return enh.JobRegistry()


@pytest.fixture(scope="module")
def source_video(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("src") / "clip.mp4")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10.0,
                             (64, 48))
    rng = np.random.default_rng(0)
    for _ in range(35):  # 3.5 s at 10 fps
        writer.write(rng.integers(0, 255, (48, 64, 3), np.uint8))
    writer.release()
    return path


def _wait(registry, job_id, statuses, timeout=120.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        snap = registry.snapshot(job_id)
        if snap.get("status") in statuses:
            return snap
        time.sleep(0.1)
    raise TimeoutError(f"job stuck: {registry.snapshot(job_id)}")


def test_effects_batch_boundary_determinism():
    """The reference's core enhancer numeric property
    (tests/test_standalone_video_enhancer.py:39-59)."""
    settings = EnhancerSettings.normalize({
        "sharpen_strength": 1.2, "grain_enabled": True,
        "grain_intensity": 0.08, "seed": 99})
    frames = np.full((8, 12, 16, 3), 0.5, np.float32)
    whole = enh.apply_effects_batch(frames, settings, frame_start=0)
    parts = np.concatenate([
        enh.apply_effects_batch(frames[:5], settings, frame_start=0),
        enh.apply_effects_batch(frames[5:], settings, frame_start=5),
    ])
    np.testing.assert_array_equal(whole, parts)


def test_full_render_job(source_video, registry, tmp_path):
    payload = {
        "source_path": source_video,
        "settings": {"segment_seconds": 5, "sharpen_strength": 1.0,
                     "grain_enabled": True, "grain_intensity": 0.05,
                     "output_name": "demo.mp4"},
    }
    snap = enh.start_render(payload, registry=registry,
                            base_folder=str(tmp_path))
    job_id = snap["job_id"]
    final = _wait(registry, job_id, {"complete", "failed", "canceled"})
    assert final["status"] == "complete", final.get("error")
    assert final["progress"] == 1.0
    # whole-job stage accumulation: every segment's decode/device/encode
    # plus the final concat, all > 0
    totals = final["stage_seconds_total"]
    assert set(totals) == {"decode", "device", "encode", "concat"}
    assert all(v > 0 for v in totals.values())
    meta = vio.probe_video(final["output_path"])
    assert meta["frame_count"] == 35
    assert meta["width"] == 64 and meta["height"] == 48
    # checkpoints cleaned up after completion
    job_folder = os.path.join(enh.jobs_folder(str(tmp_path)), job_id)
    assert not os.path.isdir(os.path.join(job_folder, "segments"))
    manifest = mf.read_manifest(job_folder)
    assert manifest["status"] == "complete"


def test_resume_after_cancel(registry, tmp_path):
    # A 120-frame source: segment_seconds=5 at 10 fps -> 50-frame segments,
    # 3 segments total.  Fabricate a canceled job with segment 0 complete.
    source_video = str(tmp_path / "long.mp4")
    writer = cv2.VideoWriter(source_video, cv2.VideoWriter_fourcc(*"mp4v"),
                             10.0, (64, 48))
    rng = np.random.default_rng(7)
    for _ in range(120):
        writer.write(rng.integers(0, 255, (48, 64, 3), np.uint8))
    writer.release()

    job_id = "enhancer_test_resume"
    job_folder = os.path.join(enh.jobs_folder(str(tmp_path)), job_id)
    segments = os.path.join(job_folder, "segments")
    os.makedirs(segments, exist_ok=True)
    settings = EnhancerSettings.normalize({"segment_seconds": 5})
    metadata = vio.probe_video(source_video)
    fingerprint = mf.settings_fingerprint(source_video, settings.to_dict(),
                                          metadata["frame_count"])
    import threading
    enh._render_segment(source_video, os.path.join(segments,
                                                   mf.segment_file_name(0)),
                        0, 50, metadata, settings, job_id,
                        threading.Event(), registry)
    mf.write_manifest(job_folder, {
        "version": 1, "job_id": job_id, "fingerprint": fingerprint,
        "source_path": source_video, "settings": settings.to_dict(),
        "metadata": metadata, "completed_segments": [0],
    })
    # Resume in a fresh registry (simulating a process restart): the
    # payload rehydrates from the manifest on disk.
    fresh = enh.JobRegistry()
    snap = enh.start_render({}, resume_job_id=job_id, registry=fresh,
                            base_folder=str(tmp_path))
    final = _wait(fresh, snap["job_id"], {"complete", "failed"})
    assert final["status"] == "complete", final.get("error")
    assert final["total_segments"] == 3
    assert vio.probe_video(final["output_path"])["frame_count"] == 120


def test_resumed_output_equals_uninterrupted(tmp_path):
    """A resumed job must produce the same frames as an uninterrupted
    run — the guarantee per-frame seeding + segment checkpoints exist
    for (VERDICT round-1 checkpoint/resume semantics)."""
    source_video = str(tmp_path / "src.mp4")
    writer = cv2.VideoWriter(source_video, cv2.VideoWriter_fourcc(*"mp4v"),
                             10.0, (64, 48))
    rng = np.random.default_rng(3)
    for _ in range(100):
        writer.write(rng.integers(0, 255, (48, 64, 3), np.uint8))
    writer.release()

    def decode(path):
        capture = cv2.VideoCapture(path)
        frames = []
        while True:
            ok, frame = capture.read()
            if not ok:
                break
            frames.append(frame)
        capture.release()
        return np.stack(frames)

    settings = {"segment_seconds": 5, "sharpen_strength": 1.0,
                "grain_enabled": True, "grain_intensity": 0.05, "seed": 9,
                "preserve_audio": False}

    # uninterrupted run
    reg_a = enh.JobRegistry()
    base_a = str(tmp_path / "a")
    snap = enh.start_render({"source_path": source_video,
                             "settings": settings}, registry=reg_a,
                            base_folder=base_a)
    full = _wait(reg_a, snap["job_id"], {"complete", "failed"})
    assert full["status"] == "complete", full.get("error")

    # interrupted run: fabricate segment 0 done, resume the rest
    base_b = str(tmp_path / "b")
    job_id = "enhancer_resume_eq"
    job_folder = os.path.join(enh.jobs_folder(base_b), job_id)
    segments = os.path.join(job_folder, "segments")
    os.makedirs(segments, exist_ok=True)
    normalized = EnhancerSettings.normalize(settings)
    metadata = vio.probe_video(source_video)
    fingerprint = mf.settings_fingerprint(source_video,
                                          normalized.to_dict(),
                                          metadata["frame_count"])
    import threading
    reg_b = enh.JobRegistry()
    enh._render_segment(source_video,
                        os.path.join(segments, mf.segment_file_name(0)),
                        0, 50, metadata, normalized, job_id,
                        threading.Event(), reg_b)
    mf.write_manifest(job_folder, {
        "version": 1, "job_id": job_id, "fingerprint": fingerprint,
        "source_path": source_video, "settings": normalized.to_dict(),
        "metadata": metadata, "completed_segments": [0],
    })
    snap = enh.start_render({}, resume_job_id=job_id, registry=reg_b,
                            base_folder=base_b)
    resumed = _wait(reg_b, snap["job_id"], {"complete", "failed"})
    assert resumed["status"] == "complete", resumed.get("error")

    np.testing.assert_array_equal(decode(full["output_path"]),
                                  decode(resumed["output_path"]))


def test_resume_refuses_changed_fingerprint(source_video, registry, tmp_path):
    job_id = "enhancer_test_stale"
    job_folder = os.path.join(enh.jobs_folder(str(tmp_path)), job_id)
    os.makedirs(job_folder, exist_ok=True)
    mf.write_manifest(job_folder, {
        "fingerprint": "deadbeef", "source_path": source_video,
        "settings": {"segment_seconds": 5}, "completed_segments": [],
    })
    enh.render_job(job_id, {"source_path": source_video,
                            "settings": {"segment_seconds": 5}},
                   resume=True, registry=registry,
                   base_folder=str(tmp_path))
    snap = registry.snapshot(job_id)
    assert snap["status"] == "failed"
    assert "cannot resume" in snap["error"]
    assert snap["can_resume"] is True


def test_single_active_job_guard(registry):
    registry.update("busy", status="running")
    with pytest.raises(ValueError, match="already running"):
        enh.start_render({"source_path": "x"}, registry=registry)


def test_cancel_event(registry):
    registry.update("j1", status="running")
    event = registry.cancel_event("j1")
    assert not event.is_set()
    enh.cancel_render("j1", registry=registry)
    assert event.is_set()
    with pytest.raises(ValueError):
        enh.cancel_render("nope", registry=registry)


def test_snapshot_strips_handles(registry):
    registry.update("j2", status="running")
    registry.attach("j2", "thread", object())
    snap = registry.snapshot("j2")
    assert "thread" not in snap


def test_preview_frame(source_video, tmp_path):
    result = enh.preview_frame(source_video, 1.0,
                               {"sharpen_strength": 2.0},
                               base_folder=str(tmp_path))
    assert os.path.isfile(result["before_path"])
    assert os.path.isfile(result["after_path"])
    assert result["frame_index"] == 10
    before = cv2.imread(result["before_path"])
    after = cv2.imread(result["after_path"])
    assert before.shape == after.shape == (48, 64, 3)
    assert np.any(before != after)  # sharpening changed pixels


def test_oom_bisection(monkeypatch):
    calls = []
    real = enh.apply_effects_batch

    def flaky(frames, settings, out_h=None, out_w=None, frame_start=0,
              mesh=None, as_uint8=False):
        calls.append(len(frames))
        if len(frames) > 2:
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")
        return real(frames, settings, out_h, out_w, frame_start)

    monkeypatch.setattr(enh, "apply_effects_batch", flaky)
    settings = EnhancerSettings.normalize({"sharpen_strength": 1.0})
    frames = np.full((8, 8, 8, 3), 0.5, np.float32)
    out, smallest = enh.process_with_retry(frames, settings, 8, 8, 0)
    assert out.shape == frames.shape
    assert smallest == 2
    assert max(calls) == 8 and 2 in calls


def test_pipelined_oom_fallback_keeps_frame_order(source_video, tmp_path,
                                                  monkeypatch):
    """Fault injection for the submit-time OOM fallback: when a submit
    raises RESOURCE_EXHAUSTED mid-stream, older in-flight batches must
    be encoded BEFORE the bisected one — the segment must stay
    byte-identical to a fault-free render (round-4 review finding 1)."""
    settings = EnhancerSettings.normalize({
        "upscale_resolution": "original", "sharpen_strength": 1.0,
        "grain_enabled": True, "grain_intensity": 0.05, "seed": 3,
        "batch_size": 4})
    meta = vio.probe_video(source_video)

    def render(out_name, inject):
        calls = {"n": 0}
        real_submit = enh.submit_effects_batch

        def flaky_submit(frames, *args, **kwargs):
            calls["n"] += 1
            if inject and calls["n"] in (3, 6):
                raise RuntimeError("RESOURCE_EXHAUSTED: injected")
            return real_submit(frames, *args, **kwargs)

        monkeypatch.setattr(enh, "submit_effects_batch", flaky_submit)
        try:
            path = str(tmp_path / out_name)
            import threading
            enh._render_segment(source_video, path, 0,
                                meta["frame_count"], meta, settings,
                                "oom_job", threading.Event(),
                                enh.JobRegistry())
        finally:
            monkeypatch.setattr(enh, "submit_effects_batch", real_submit)
        with open(path, "rb") as handle:
            return handle.read()

    clean = render("clean.mp4", inject=False)
    faulty = render("faulty.mp4", inject=True)
    assert clean == faulty
