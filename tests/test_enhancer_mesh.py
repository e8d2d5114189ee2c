"""Mesh-sharded enhancer (BASELINE config 5): frame batches distributed
over the virtual 8-device CPU mesh must be bit-identical to single-device
output — the property per-frame seeding guarantees by construction."""

import time

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax

from vrgdg_tpu.core.params import EnhancerSettings
from vrgdg_tpu.jobs import enhancer as enh


@pytest.fixture(scope="module")
def source_video(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("src") / "clip.mp4")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10.0,
                             (64, 48))
    rng = np.random.default_rng(7)
    for _ in range(30):
        writer.write(rng.integers(0, 255, (48, 64, 3), np.uint8))
    writer.release()
    return path


def _decode_all(path):
    capture = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, frame = capture.read()
        if not ok:
            break
        frames.append(frame)
    capture.release()
    return np.stack(frames)


def _wait(registry, job_id, timeout=180.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        snap = registry.snapshot(job_id)
        if snap.get("status") in {"complete", "failed", "canceled"}:
            return snap
    raise TimeoutError(registry.snapshot(job_id))


def test_mesh_for_settings():
    assert enh.mesh_for_settings(
        EnhancerSettings.normalize({"data_parallel": 1})) is None
    mesh = enh.mesh_for_settings(EnhancerSettings.normalize({}))
    assert mesh is not None
    assert mesh.devices.size == len(jax.devices())
    mesh4 = enh.mesh_for_settings(
        EnhancerSettings.normalize({"data_parallel": 4}))
    assert mesh4.devices.size == 4


def test_effects_batch_mesh_bit_identity():
    settings = EnhancerSettings.normalize({
        "sharpen_strength": 1.2, "grain_enabled": True,
        "grain_intensity": 0.08, "seed": 99})
    mesh = enh.mesh_for_settings(settings)
    assert mesh is not None and mesh.devices.size == 8
    rng = np.random.default_rng(1)
    # 5 frames: does NOT divide the 8-device mesh -> exercises padding
    frames = rng.uniform(0, 1, (5, 12, 16, 3)).astype(np.float32)
    single = enh.apply_effects_batch(frames, settings, 24, 32,
                                     frame_start=3, mesh=None)
    sharded = enh.apply_effects_batch(frames, settings, 24, 32,
                                      frame_start=3, mesh=mesh)
    np.testing.assert_array_equal(single, sharded)


def test_effects_batch_spatial_sharding_tolerance():
    """Height-axis spatial sharding (4 data x 2 space): stencil halos are
    exact, resize matmuls reassociate -> float-tolerance equality."""
    settings = EnhancerSettings.normalize({
        "sharpen_strength": 1.2, "grain_enabled": True,
        "grain_intensity": 0.05, "seed": 5, "spatial_parallel": 2})
    mesh = enh.mesh_for_settings(settings)
    assert mesh is not None
    assert mesh.shape["space"] == 2 and mesh.devices.size == 8
    rng = np.random.default_rng(2)
    frames = rng.uniform(0, 1, (4, 16, 24, 3)).astype(np.float32)
    single = enh.apply_effects_batch(frames, settings, 32, 48,
                                     frame_start=0, mesh=None)
    sharded = enh.apply_effects_batch(frames, settings, 32, 48,
                                      frame_start=0, mesh=mesh)
    np.testing.assert_allclose(sharded, single, atol=1e-5)


def test_spatial_falls_back_when_height_indivisible():
    settings = EnhancerSettings.normalize({"spatial_parallel": 2,
                                           "sharpen_strength": 1.0})
    mesh = enh.mesh_for_settings(settings)
    rng = np.random.default_rng(3)
    frames = rng.uniform(0, 1, (4, 15, 24, 3)).astype(np.float32)  # 15 % 2 != 0
    single = enh.apply_effects_batch(frames, settings, 30, 48, mesh=None)
    sharded = enh.apply_effects_batch(frames, settings, 30, 48, mesh=mesh)
    np.testing.assert_allclose(sharded, single, atol=1e-5)


def test_full_job_mesh_vs_single_bit_identity(source_video, tmp_path):
    outputs = {}
    for name, dp in (("mesh", 0), ("single", 1)):
        registry = enh.JobRegistry()
        payload = {
            "source_path": source_video,
            "settings": {"segment_seconds": 5, "sharpen_strength": 1.0,
                         "grain_enabled": True, "grain_intensity": 0.05,
                         "seed": 11, "data_parallel": dp,
                         "preserve_audio": False},
        }
        base = str(tmp_path / name)
        job = enh.start_render(payload, registry=registry, base_folder=base)
        snap = _wait(registry, job["job_id"])
        assert snap["status"] == "complete", snap.get("error")
        outputs[name] = _decode_all(snap["output_path"])
        if name == "mesh":
            assert snap.get("mesh_devices") == 8
            assert snap.get("fps_per_chip", 0) > 0
    np.testing.assert_array_equal(outputs["mesh"], outputs["single"])


def test_parallel_decode_output_identical(source_video, tmp_path):
    """decode_workers must not change the rendered frames."""
    outputs = {}
    for name, workers in (("par", 3), ("seq", 1)):
        registry = enh.JobRegistry()
        payload = {"source_path": source_video,
                   "settings": {"segment_seconds": 5,
                                "sharpen_strength": 1.0,
                                "grain_enabled": True,
                                "grain_intensity": 0.05, "seed": 11,
                                "data_parallel": 1,
                                "decode_workers": workers,
                                "preserve_audio": False}}
        base = str(tmp_path / f"dec_{name}")
        job = enh.start_render(payload, registry=registry, base_folder=base)
        snap = _wait(registry, job["job_id"])
        assert snap["status"] == "complete", snap.get("error")
        outputs[name] = _decode_all(snap["output_path"])
    np.testing.assert_array_equal(outputs["par"], outputs["seq"])
