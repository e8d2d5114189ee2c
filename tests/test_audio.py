"""Silent-audio generator + peak reader (VRGDG_SilentAudioRoutes.py)."""

import os
import wave

import numpy as np
import pytest

from vrgdg_tpu.runtime import audio


def test_clean_duration():
    assert audio.clean_duration(5) == 5.0
    assert audio.clean_duration(0.01) == 0.1
    assert audio.clean_duration(1e9) == 24 * 60 * 60
    with pytest.raises(ValueError):
        audio.clean_duration(0)
    with pytest.raises(ValueError):
        audio.clean_duration("nope")


def test_write_silent_wav_and_peaks(tmp_path):
    path = str(tmp_path / "s.wav")
    audio.write_silent_wav(path, 1.5, sample_rate=8000)
    with wave.open(path, "rb") as handle:
        assert handle.getnchannels() == 2
        assert handle.getframerate() == 8000
        assert handle.getnframes() == 12000
    info = audio.read_audio_peaks(path, 100)
    assert info["duration"] == pytest.approx(1.5)
    assert max(info["peaks"]) == 0.0


def test_read_peaks_envelope(tmp_path):
    # one loud burst in the middle of silence
    path = str(tmp_path / "tone.wav")
    rate = 8000
    samples = np.zeros(rate, np.int16)
    samples[4000:4400] = 20000
    with wave.open(path, "wb") as handle:
        handle.setnchannels(1)
        handle.setsampwidth(2)
        handle.setframerate(rate)
        handle.writeframes(samples.tobytes())
    info = audio.read_audio_peaks(path, 10)
    peaks = info["peaks"]
    assert len(peaks) == 10
    assert peaks[5] == pytest.approx(20000 / 32767.0, abs=1e-3)
    assert peaks[0] == 0.0


def test_create_silent_audio_scopes(tmp_path):
    base = str(tmp_path / "proj")
    scene = audio.create_silent_audio(
        {"project_folder": base, "duration": 2, "scope": "scene",
         "scene_number": 3})
    assert scene["audio_path"].endswith(os.path.join("scene_audio",
                                                     "audio_0003.wav"))
    assert scene["scope"] == "scene" and scene["scene_number"] == 3
    project = audio.create_silent_audio(
        {"project_folder": base, "duration": 2.5})
    assert "project_silence_2_5s.wav" in project["audio_path"]
    assert project["duration"] == pytest.approx(2.5)
    with pytest.raises(ValueError):
        audio.create_silent_audio({"project_folder": "", "duration": 2})
