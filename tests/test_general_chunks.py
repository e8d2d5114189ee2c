"""General single-chunk-per-run splitter family: oracle fuzz vs
GeneralVideoNodes.py (the ComfyUI queue/popup/timestamp-folder glue
and the VHS Video Combine encoder stay out; all chunk/frame/offset
math is compared)."""

import json
import os
import random

import numpy as np
import torch

from vrgdg_tpu.runtime import audio_toolkit as at
from vrgdg_tpu.runtime import prompt_splitters as ps
from vrgdg_tpu.runtime.video_io import build_chunk_output_path

from tests.reference_oracle import load_reference


def _load(names, extra=None):
    base = {"torch": torch, "any_typ": "*"}
    base.update(extra or {})
    return load_reference("GeneralVideoNodes.py", names,
                          extra_globals=base)


def test_adjust_frames_parity():
    ns = _load(["VRGDG_LoadAudioSplit_General"])
    node = ns["VRGDG_LoadAudioSplit_General"]()
    for frames in range(1, 300):
        assert at.adjust_frames_mult9(frames) == \
            node._adjust_frames(frames, 24, False)
        assert at.adjust_frames_humo(frames) == \
            node._adjust_frames(frames, 25, True)


def test_general_chunk_index_parity(tmp_path):
    ns = _load(["VRGDG_LoadAudioSplit_General"])
    node = ns["VRGDG_LoadAudioSplit_General"]()
    names = ["video_0000_00001-audio.mp4", "video_0002_00003-audio.mp4",
             "video_0001_00002.mp4", "other.mp4",
             "clip_0005_1-audio.mp4", "noise-audio.mp4"]
    for name in names:
        (tmp_path / name).write_bytes(b"")
    assert at.general_chunk_index(str(tmp_path)) == \
        node._count_index_from_folder(str(tmp_path)) == 6
    assert at.general_chunk_index(str(tmp_path / "missing")) == 0


def test_split_general_chunk_parity(tmp_path):
    """Full run() parity on 44.1 kHz stereo input (no resample path):
    chunk audio bytes, frames, offsets, time strings, totals."""
    class _FakePromptServer:
        class instance:  # noqa: N801
            @staticmethod
            def send_sync(*_a, **_k):
                return None

    class _FakeFolderPaths:
        @staticmethod
        def get_output_directory():
            return str(tmp_path / "out")

    def add_preroll_frames(frames_per_scene, chunk_index,
                           preroll_frames=6):
        if chunk_index == 0:
            return frames_per_scene, 0
        return frames_per_scene + preroll_frames, preroll_frames

    ns = _load(["VRGDG_LoadAudioSplit_General"],
               extra={"folder_paths": _FakeFolderPaths,
                      "PromptServer": _FakePromptServer,
                      "add_preroll_frames": add_preroll_frames})
    node = ns["VRGDG_LoadAudioSplit_General"]()
    os.makedirs(tmp_path / "out", exist_ok=True)

    rng = np.random.default_rng(11)
    rate = 44100
    for case in range(10):
        seconds = float(rng.uniform(3.0, 60.0))
        wave = rng.standard_normal(
            (1, 2, int(rate * seconds))).astype(np.float32)
        audio_t = {"waveform": torch.from_numpy(wave),
                   "sample_rate": rate}
        fps = int(rng.choice([24, 25, 30]))
        humo = bool(rng.random() < 0.3) and fps == 25
        scene = float(rng.uniform(2.0, 6.0))
        # the reference rejects override indexes beyond total chunks
        probe = at.split_general_chunk(
            {"waveform": wave, "sample_rate": rate}, chunk_index=0,
            scene_duration_seconds=scene, fps=fps,
            use_humo_alignment=humo)
        index = int(rng.integers(0, min(3, probe["total_sets"])))

        out = node.run(
            audio_t, trigger=None,
            scene_duration_seconds=scene, fps=fps,
            List_of_Scene_durations=0, manual_total_sets=0,
            folder_path="job", enable_auto_queue=False,
            override_chunk_index=index, overwrite_mode="overwrite",
            use_humo_alignment=humo)
        (meta_ref, total_ref, index_ref, ltx_ref, start_ref, end_ref,
         _instr, sets_ref, fpsc_ref, preroll_ref, ameta_ref, _folder,
         _ow, audio_ref, _sig) = out

        ours = at.split_general_chunk(
            {"waveform": wave, "sample_rate": rate},
            chunk_index=index, scene_duration_seconds=scene, fps=fps,
            use_humo_alignment=humo)

        assert ours["total_sets"] == sets_ref, f"case {case}"
        assert ours["frames_per_scene"] == fpsc_ref
        assert ours["frames_for_ltx"] == ltx_ref
        assert ours["preroll_frames"] == preroll_ref
        assert ours["start_time"] == start_ref
        assert ours["end_time"] == end_ref
        assert ours["audio_meta"] == ameta_ref
        assert ours["meta"]["starts"] == meta_ref["starts"]
        assert ours["meta"]["offset_seconds"] == \
            meta_ref["offset_seconds"]
        assert ours["total_sets"] == sets_ref
        np.testing.assert_array_equal(
            np.squeeze(ours["audio"]["waveform"]),
            np.squeeze(audio_ref["waveform"].numpy()))

    # custom-duration mode: durations drive frames and offsets
    durations = [2.0, 3.5, 4.25]
    json.dump(durations, open(
        os.path.join(__import__("tempfile").gettempdir(),
                     "vrgdg_scene_durations.json"), "w"))
    wave = rng.standard_normal((1, 2, rate * 12)).astype(np.float32)
    audio_t = {"waveform": torch.from_numpy(wave), "sample_rate": rate}
    for index in range(3):
        out = node.run(
            audio_t, trigger=None, scene_duration_seconds=4.0, fps=24,
            List_of_Scene_durations=1, manual_total_sets=3,
            folder_path="job", enable_auto_queue=False,
            override_chunk_index=index, overwrite_mode="overwrite",
            use_humo_alignment=False)
        ours = at.split_general_chunk(
            {"waveform": wave, "sample_rate": rate},
            chunk_index=index, fps=24, durations=durations)
        assert ours["frames_per_scene"] == out[8]
        assert ours["frames_for_ltx"] == out[3]
        assert ours["meta"]["starts"] == out[0]["starts"]
        np.testing.assert_array_equal(
            np.squeeze(ours["audio"]["waveform"]),
            np.squeeze(out[13]["waveform"].numpy()))


def test_duration_list_parity():
    ns = _load(["VRGDG_DurationIndexFloat"])
    node = ns["VRGDG_DurationIndexFloat"]()
    rng = random.Random(3)
    for _ in range(60):
        parts = []
        for _ in range(rng.randrange(0, 8)):
            parts.append(rng.choice(
                ["2.5", "3", "bad", "4.125", "", "0.5"]))
        sep = rng.choice([",", "\n", " ", ", "])
        text = sep.join(parts)
        index = rng.randrange(0, 9)
        expected = node.run(text, index)
        value, count = at.duration_at_index(text, index)
        assert (value, count) == expected
        # the persisted list the reference writes equals our parse
        durations = at.parse_duration_list(text)
        if durations:
            import tempfile

            persisted = json.load(open(os.path.join(
                tempfile.gettempdir(),
                "vrgdg_scene_durations.json")))
            assert persisted == durations


def test_build_chunk_output_path_parity(tmp_path):
    ns = _load(["VRGDG_BuildVideoOutputPath_General_SRT",
                "VRGDG_BuildVideoOutputPath_General"],
               extra={"datetime": __import__("datetime").datetime})
    srt_node = ns["VRGDG_BuildVideoOutputPath_General_SRT"]()
    plain_node = ns["VRGDG_BuildVideoOutputPath_General"]()

    for base in ("video", "clip_0003", "take_01_22"):
        for index in (0, 4):
            folder_ref = tmp_path / f"ref_{base}_{index}"
            folder_our = tmp_path / f"our_{base}_{index}"
            (ref_path,) = srt_node.run(str(folder_ref), index, base,
                                       "overwrite")
            our_path = build_chunk_output_path(str(folder_our), index,
                                               base, "overwrite",
                                               srt_naming=True)
            assert os.path.basename(our_path) == \
                os.path.basename(ref_path)
            (ref_path,) = plain_node.run(str(folder_ref), index, base,
                                         "overwrite")
            our_path = build_chunk_output_path(
                str(folder_our), index, base, "overwrite")
            assert os.path.basename(our_path) == \
                os.path.basename(ref_path)

    # backup mode: the shipped builder deliberately hardens the
    # reference's prefix sweep into an exact-stem match (see the
    # docstring + tests/test_video_utils.py); here just the SRT-name
    # rotation into backup/ under its own name
    work = tmp_path / "bk"
    work.mkdir()
    (work / "video_0003_0002.mp4").write_bytes(b"x")
    path = build_chunk_output_path(str(work), 2, "video", "backup",
                                   srt_naming=True)
    assert os.path.basename(path) == "video_0003_0002"
    assert (work / "backup" / "video_0003_0002.mp4").exists()
    assert not (work / "video_0003_0002.mp4").exists()


def test_pick_cycled_prompt_parity():
    ns = _load(["VRGDG_PromptSplitter_General"])
    node = ns["VRGDG_PromptSplitter_General"]()
    rng = random.Random(5)
    samples = ['{"prompt2": "b", "prompt1": "a", "prompt10": "c"}',
               '["x", "y"]', "[]", "{}", "not json", '"scalar"',
               '{"intro": "i", "prompt3": "p"}']
    for _ in range(40):
        samples.append(json.dumps(
            {f"prompt{rng.randrange(1, 30)}": f"t{rng.random():.3f}"
             for _ in range(rng.randrange(0, 6))}))
    for text in samples:
        for index in (0, 1, 5, 17):
            assert ps.pick_cycled_prompt(text, index) == \
                node.split_prompt(text, index)[0]
