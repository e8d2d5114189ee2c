"""HuMo audio-set splitter + queue set calculator: oracle fuzz vs
HumoAutomation.py (the Whisper transcription is external; only the
deterministic split/meta/count math is compared)."""

import random as _random_mod

import numpy as np
import pytest
import torch

from vrgdg_tpu.runtime import audio_toolkit as at

from tests.reference_oracle import load_reference


class _FakeTorchaudio:
    @staticmethod
    def save(*_args, **_kwargs):
        return None


def _splitter(tmp_path):
    class _FakeFolderPaths:
        @staticmethod
        def get_input_directory():
            return str(tmp_path / "chunks")

    rng = _random_mod.Random(0)
    ref = load_reference(
        "HumoAutomation.py", ["VRGDG_LoadAudioSplit_HUMO_TranscribeV2"],
        extra_globals={"torch": torch, "torchaudio": _FakeTorchaudio,
                       "folder_paths": _FakeFolderPaths,
                       "random": rng,
                       "WhisperProcessor": None,
                       "WhisperForConditionalGeneration": None})
    return ref["VRGDG_LoadAudioSplit_HUMO_TranscribeV2"]()


def test_humo_set_split_parity(tmp_path):
    ref = _splitter(tmp_path)
    rng = np.random.default_rng(3)
    for case in range(12):
        rate = int(rng.choice([48000, 44100, 22050]))
        seconds = float(rng.uniform(0.5, 130.0))
        samples = int(rate * seconds)
        wave = rng.standard_normal((1, samples)).astype(np.float32)
        set_index = int(rng.integers(0, 3))

        audio_t = {"waveform": torch.from_numpy(wave)[None],
                   "sample_rate": rate}
        out_ref = ref.split_audio(audio_t, set_index=set_index,
                                  enable_lyrics=False)
        meta_ref, duration_ref = out_ref[0], out_ref[1]
        segments_ref = out_ref[3:]

        ours = at.split_audio_humo_set({"waveform": wave,
                                        "sample_rate": rate},
                                       set_index=set_index)
        assert ours["meta"]["starts"] == meta_ref["starts"]
        assert ours["meta"]["durations"] == meta_ref["durations"]
        assert ours["meta"]["sample_rate"] == meta_ref["sample_rate"]
        assert ours["total_duration"] == pytest.approx(duration_ref)
        assert len(ours["segments"]) == len(segments_ref) == 16
        for mine, theirs in zip(ours["segments"], segments_ref):
            ref_wave = np.squeeze(theirs["waveform"].numpy())
            my_wave = np.squeeze(mine["waveform"])
            assert my_wave.shape == ref_wave.shape, f"case {case}"
            np.testing.assert_array_equal(my_wave, ref_wave)


def test_queue_set_calculator_parity():
    ref = load_reference(
        "HumoAutomation.py", ["VRGDG_CalculateSetsFromAudio_Queue"]
    )["VRGDG_CalculateSetsFromAudio_Queue"]()
    rng = np.random.default_rng(4)
    for _ in range(40):
        rate = int(rng.choice([48000, 44100, 16000]))
        seconds = float(rng.uniform(0.0, 400.0))
        wave = np.zeros((1, int(rate * seconds)), np.float32)
        audio = {"waveform": wave, "sample_rate": rate}
        (_, end_ref, sets_ref, last_ref, fps_ref,
         meta_ref) = ref.calculate(audio, 0)
        ours = at.calculate_sets_frames(audio)
        assert ours["end_time"] == end_ref
        assert ours["total_sets"] == sets_ref
        assert ours["groups_in_last_set"] == last_ref
        assert ours["frames_per_scene"] == fps_ref
        assert ours["audio_meta"] == meta_ref


def test_enrich_lyric_lines():
    text = at.enrich_lyric_lines(
        ["hold me", "", "run"], contexts=["", "slow pan", ""],
        fallback_words="thinking,walking", scene_count=4)
    parts = text.split(" | ")
    assert parts[0] == "hold me"
    assert parts[1] == "slow pan, walking"   # index-rotated fallback
    assert parts[2] == "run"
    assert parts[3] == "walking"             # index 3 % 2 fallback
    assert len(parts) == 4
