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


def test_wan22_set_planner_parity():
    """calculate_wan22_sets vs the inlined _calculate_sets
    (HumoAutomation.py:2970-3104): numeric outputs including the
    first-group fixup and the per-index durations slice."""
    class _FakePromptServer:
        class instance:  # noqa: N801
            @staticmethod
            def send_sync(*_a, **_k):
                return None

    class _FakeFolderPaths:
        @staticmethod
        def get_output_directory():
            return "/tmp"

    ref = load_reference(
        "HumoAutomation.py", ["VRGDG_LoadAudioSplit_Wan22HumoFMML"],
        extra_globals={"torch": torch, "any_typ": "*",
                       "folder_paths": _FakeFolderPaths,
                       "PromptServer": _FakePromptServer})
    node = ref["VRGDG_LoadAudioSplit_Wan22HumoFMML"]()

    rng = np.random.default_rng(9)
    for _ in range(50):
        rate = int(rng.choice([48000, 44100, 16000]))
        seconds = float(rng.uniform(0.0, 500.0))
        scene = float(rng.uniform(1.0, 5.0))
        index = int(rng.integers(0, 4))
        wave = np.zeros((1, int(rate * seconds)), np.float32)
        audio = {"waveform": wave, "sample_rate": rate}
        (_, end_ref, sets_ref, last_ref, fpsc_ref,
         meta_ref) = node._calculate_sets(audio, index, scene, True)
        ours = at.calculate_wan22_sets(audio, index=index,
                                       scene_duration_seconds=scene)
        assert ours["end_time"] == end_ref
        assert ours["total_sets"] == sets_ref
        assert ours["groups_in_last_set"] == last_ref
        assert ours["frames_per_scene"] == fpsc_ref
        assert ours["audio_meta"] == meta_ref


def test_split_rounded_scene_samples():
    """The Wan22 rounding variant's chunk size matches the reference
    expression int(frames * rate / fps + 0.5) (HumoAutomation.py:3181)
    and differs from the per-frame math at non-divisible rates."""
    rate, frames, fps = 44100, 101, 24   # 44100/24 = 1837.5
    out = at.split_audio_humo_set(
        {"waveform": np.zeros((1, rate * 5), np.float32),
         "sample_rate": rate},
        frames_per_scene=frames, fps=fps, rounded_scene_samples=True)
    expected = int(frames * rate / fps + 0.5)
    assert out["segments"][0]["waveform"].shape[-1] == expected
    per_frame = frames * int(round(rate / fps))
    assert expected != per_frame  # the two roundings really differ
    # count_completed_sets
    assert at.count_completed_sets("/nonexistent/x") == 0


def test_assemble_final_video(tmp_path):
    import cv2

    from vrgdg_tpu.runtime.video_io import (assemble_final_video,
                                            probe_video)

    def _write(name, count, value):
        writer = cv2.VideoWriter(
            str(tmp_path / name), cv2.VideoWriter_fourcc(*"mp4v"),
            10.0, (32, 24))
        for _ in range(count):
            writer.write(np.full((24, 32, 3), value, np.uint8))
        writer.release()

    _write("set1-audio.mp4", 4, 40)
    _write("set2-audio.mp4", 6, 90)
    _write("ignored.mp4", 3, 10)          # no -audio suffix

    out = assemble_final_video(str(tmp_path), threshold=3)
    assert out["skipped"] and out["count"] == 2

    _write("set3-audio.mp4", 5, 140)
    out = assemble_final_video(str(tmp_path), threshold=3)
    assert not out["skipped"] and out["count"] == 3
    probe = probe_video(out["output"])
    assert probe["frame_count"] == 4 + 6 + 5
    assert probe["width"] == 32 and probe["height"] == 24


def test_assemble_final_video_redo_mode(tmp_path):
    import json

    import cv2

    from vrgdg_tpu.runtime.video_io import assemble_final_video

    writer = cv2.VideoWriter(str(tmp_path / "s1-audio.mp4"),
                             cv2.VideoWriter_fourcc(*"mp4v"),
                             10.0, (32, 24))
    for _ in range(3):
        writer.write(np.zeros((24, 32, 3), np.uint8))
    writer.release()

    # redo bypasses the threshold but waits on a pending override queue
    state = tmp_path / "vrgdg_temp"
    state.mkdir()
    (state / "vrgdg_override_queue.json").write_text(json.dumps([3, 5]))
    out = assemble_final_video(str(tmp_path), threshold=5, redo=True)
    assert out["skipped"] and out["waiting_for"] == [3, 5]

    (state / "vrgdg_override_queue.json").write_text("[]")
    out = assemble_final_video(str(tmp_path), threshold=5, redo=True)
    assert not out["skipped"]
    assert out["output"].endswith("FINAL_VIDEO_REDO.mp4")

    # never overwrite: second run picks a numbered sibling
    out = assemble_final_video(str(tmp_path), threshold=5, redo=True)
    assert out["output"].endswith("FINAL_VIDEO_REDO2.mp4")
