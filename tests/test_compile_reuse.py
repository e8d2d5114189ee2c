"""Compile-reuse contract (SURVEY §7 "dynamic shapes").

A video job must run ONE compiled program for its resolution regardless
of frame count: tail batches (N % batch_size frames) are padded back to
the full batch on the frame axis and the pad frames sliced off — exact,
because every stage is frame-local (per-frame color-match statistics,
per-(seed + absolute index) grain).  Novel-resolution reuse across
processes is the persistent compilation cache's job
(runtime/compile_cache.py; measured on chip in BASELINE.md round 5).
"""

import os

import cv2
import numpy as np
import pytest

from vrgdg_tpu import api
from vrgdg_tpu.runtime import compile_cache


@pytest.fixture()
def clip(tmp_path):
    video = str(tmp_path / "clip.mp4")
    writer = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 10.0,
                             (64, 48))
    rng = np.random.default_rng(0)
    for _ in range(10):  # batch_size=4 -> batches of 4, 4, 2 (tail)
        writer.write(rng.integers(0, 255, (48, 64, 3), np.uint8))
    writer.release()
    return video


def test_video_job_compiles_one_program(clip, tmp_path):
    import jax

    from vrgdg_tpu.ops.grade import _grade_impl

    jax.clear_caches()
    out = str(tmp_path / "out.mp4")
    result = api.apply_lut_to_video(clip, "teal_orange.cube",
                                    output_path=out, batch_size=4)
    assert result["processed_frames"] == 10
    # one trace for the whole job: the 2-frame tail reused the (4, H, W)
    # program instead of compiling a second one
    assert _grade_impl._cache_size() == 1


def test_tail_padding_matches_unpadded_output(clip, tmp_path):
    """The padded tail's real frames must be byte-identical to a run
    whose batch size divides the frame count (no tail)."""
    out_tail = str(tmp_path / "tail.mp4")
    out_even = str(tmp_path / "even.mp4")
    # grain makes this a strong check: per-frame seeding must ignore the
    # pad frames entirely
    api.apply_film_grain_to_video(clip, output_path=out_tail, batch_size=4,
                                  grain_intensity=0.08, seed=9,
                                  preserve_audio=False)
    api.apply_film_grain_to_video(clip, output_path=out_even, batch_size=5,
                                  grain_intensity=0.08, seed=9,
                                  preserve_audio=False)
    with open(out_tail, "rb") as handle:
        tail_bytes = handle.read()
    with open(out_even, "rb") as handle:
        even_bytes = handle.read()
    assert tail_bytes == even_bytes


def test_enhancer_job_compiles_one_step_program(clip, tmp_path):
    import jax

    from vrgdg_tpu.jobs import enhancer

    jax.clear_caches()
    registry = enhancer.JobRegistry()
    enhancer.render_job(
        "reuse_job",
        {"source_path": clip,
         "settings": {"sharpen_strength": 1.0, "grain_enabled": True,
                      "grain_intensity": 0.05, "seed": 3,
                      "segment_seconds": 5, "batch_size": 4,
                      "preserve_audio": False}},
        registry=registry, base_folder=str(tmp_path / "jobs"))
    snap = registry.snapshot("reuse_job")
    assert snap["status"] == "complete", snap.get("error")
    # 10 frames @ 10 fps -> one 5 s segment of 10 frames: batches 4, 4,
    # and a padded 2-frame tail, all through one compiled step
    assert enhancer._enhance_step._cache_size() == 1


def test_compile_cache_env_overrides(tmp_path, monkeypatch):
    monkeypatch.setattr(compile_cache, "_state", {"enabled": None})
    monkeypatch.setenv("VRGDG_COMPILE_CACHE", "off")
    assert compile_cache.enable_compile_cache() is False
    assert compile_cache.cache_dir() is None

    # a path forces the cache on (any backend) and relocates it
    import jax

    monkeypatch.setattr(compile_cache, "_state", {"enabled": None})
    target = str(tmp_path / "xla_cache")
    monkeypatch.setenv("VRGDG_COMPILE_CACHE", target)
    try:
        assert compile_cache.enable_compile_cache() is True
        assert compile_cache.cache_dir() == target
        assert os.path.isdir(target)
        # idempotent: a second call keeps the active state
        assert compile_cache.enable_compile_cache() is True
    finally:
        # keep the suite hermetic: tmp_path is deleted after the test
        jax.config.update("jax_compilation_cache_dir", None)


def test_compile_cache_defaults_off_on_cpu(monkeypatch):
    monkeypatch.setattr(compile_cache, "_state", {"enabled": None})
    monkeypatch.delenv("VRGDG_COMPILE_CACHE", raising=False)
    # the CPU-suite backend is not TPU, so the default is inactive
    assert compile_cache.enable_compile_cache() is False
