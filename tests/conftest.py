"""Test configuration: force an 8-device virtual CPU mesh.

Mirrors SURVEY.md §4's recommended strategy: multi-device behaviour is
tested on CPU-backed JAX with ``--xla_force_host_platform_device_count=8``
standing in for a TPU mesh, so the suite runs anywhere.

The environment's sitecustomize may pre-register a TPU platform plugin at
interpreter startup, so setting ``JAX_PLATFORMS`` via the environment is
not enough — ``jax.config.update`` after import is the reliable override.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import pytest  # noqa: E402


@pytest.fixture()
def fake_ffmpeg(tmp_path, monkeypatch):
    """Install tests/fake_ffmpeg.py as the discovered ffmpeg binary so
    the production-only ffmpeg code paths execute in CI (this image
    ships no real ffmpeg)."""
    import shutil
    import stat

    from vrgdg_tpu.runtime import video_io

    source = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "fake_ffmpeg.py")
    target = tmp_path / "ffmpeg"
    shutil.copy(source, target)
    target.chmod(target.stat().st_mode | stat.S_IXUSR)
    monkeypatch.setattr(video_io, "find_ffmpeg", lambda: str(target))
    monkeypatch.delenv("FAKE_FFMPEG_FAIL", raising=False)
    monkeypatch.delenv("FAKE_FFMPEG_SLEEP", raising=False)
    return str(target)
