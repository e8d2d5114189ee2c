import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vrgdg_tpu import cli


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cli") / "clip.mp4")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10.0,
                             (64, 48))
    rng = np.random.default_rng(0)
    for _ in range(8):
        writer.write(rng.integers(0, 255, (48, 64, 3), np.uint8))
    writer.release()
    return path


def _last_json(capsys):
    return json.loads(capsys.readouterr().out)


def test_probe(video, capsys):
    cli.main(["probe", video])
    meta = _last_json(capsys)
    assert meta["frame_count"] == 8


def test_luts(capsys):
    cli.main(["luts"])
    catalog = _last_json(capsys)
    assert len(catalog["luts"]) >= 12


def test_make_lut(tmp_path, capsys):
    out = str(tmp_path / "custom.cube")
    cli.main(["make-lut", "#112233, #ddeeff", "-o", out, "--size", "17"])
    assert os.path.isfile(out)
    from vrgdg_tpu.core.cube import parse_cube
    assert parse_cube(out).size == 17


def test_lut_apply(video, tmp_path, capsys):
    out = str(tmp_path / "graded.mp4")
    cli.main(["lut", video, "golden_hour.cube", "-o", out,
              "--strength", "6"])
    result = _last_json(capsys)
    assert result["processed_frames"] == 8
    assert os.path.isfile(out)


def test_grade_fused(video, tmp_path, capsys):
    out = str(tmp_path / "full.mp4")
    cli.main(["grade", video, "-o", out, "--lut", "cyber_neon.cube",
              "--sharpen", "1.0", "--grain", "0.05", "--seed", "3",
              "--adjust", '{"contrast": 15}'])
    result = _last_json(capsys)
    assert result["stages"] == ["lut", "adjust", "sharpen", "grain"]
    assert os.path.isfile(out)


def test_enhance_job(video, tmp_path, capsys):
    cli.main(["enhance", video, "--settings",
              '{"sharpen_strength": 1.0, "grain_enabled": true}',
              "--output-root", str(tmp_path)])
    result = _last_json(capsys)
    assert result["status"] == "complete"
    assert os.path.isfile(result["output_path"])


@pytest.fixture(scope="module")
def click_wav(tmp_path_factory):
    """2-minute-equivalent synthetic click track WAV (12 s, 120 BPM)."""
    from vrgdg_tpu.runtime import audio_toolkit as at

    sr = 22050
    rng = np.random.default_rng(3)
    n = 12 * sr
    y = rng.normal(0, 0.003, n).astype(np.float32)
    burst = np.exp(-np.linspace(0, 6, int(0.02 * sr))).astype(np.float32)
    for start in range(0, n, sr // 2):
        end = min(n, start + burst.size)
        y[start:end] += 0.9 * burst[:end - start] * rng.normal(
            0, 1, end - start).astype(np.float32)
    path = str(tmp_path_factory.mktemp("beats") / "click.wav")
    at.save_wav(path, at.make_audio(np.tile(y, (1, 2, 1)), sr))
    return path


def test_beats_and_scene_srt(click_wav, tmp_path, capsys):
    data_path = str(tmp_path / "beat_data.json")
    cli.main(["beats", click_wav, "-o", data_path])
    summary = _last_json(capsys)
    assert abs(summary["bpm"] - 120.0) < 6.0
    assert summary["source_used_for_beats"] == "final_mix"
    with open(data_path) as fh:
        data = json.load(fh)
    assert len(data["beats"]) > 10

    srt_path = str(tmp_path / "scenes.srt")
    cli.main(["scene-srt", data_path, "-o", srt_path, "--seed", "4",
              "--min-duration", "1.5", "--max-duration", "4"])
    result = _last_json(capsys)
    assert result["srt_path"] == srt_path and result["scenes"] >= 2
    with open(srt_path) as fh:
        assert "-->" in fh.read()


def test_audio_cli(click_wav, tmp_path, capsys):
    out_dir = str(tmp_path / "segs")
    cli.main(["audio", "split", click_wav, "-o", out_dir,
              "--durations", "3,4,5"])
    meta = _last_json(capsys)
    assert meta["scene_count"] == 3 and len(meta["outputs"]) == 3
    assert all(os.path.isfile(p) for p in meta["outputs"])

    srt = ("1\n00:00:00,000 --> 00:00:04,000\nA\n\n"
           "2\n00:00:04,000 --> 00:00:08,000\nB\n")
    srt_file = str(tmp_path / "cues.srt")
    with open(srt_file, "w") as fh:
        fh.write(srt)
    seg_out = str(tmp_path / "chunk1.wav")
    cli.main(["audio", "srt-split", click_wav, "--srt", srt_file,
              "--chunk-index", "1", "-o", seg_out])
    result = _last_json(capsys)
    assert result["frames_for_ltx"] % 8 == 1
    assert os.path.isfile(seg_out)

    cli.main(["audio", "delay", click_wav, "--chunk-index", "2",
              "--delay-ms", "50", "-o", str(tmp_path / "d.wav")])
    delayed = _last_json(capsys)
    assert delayed["samples"] == 12 * 22050 + int(0.05 * 22050)

    cli.main(["audio", "peaks", click_wav])
    peaks = _last_json(capsys)
    assert peaks["sample_rate"] == 22050 and len(peaks["peaks"]) >= 500


def test_builder_cli_lifecycle(tmp_path, capsys):
    """builder new/save/list/export/import/delete round trip
    (VRGDG_MusicVideoBuilderNodes.py project store, CLI surface)."""
    import wave

    root = str(tmp_path / "out")
    wav = str(tmp_path / "s.wav")
    with wave.open(wav, "wb") as handle:
        handle.setnchannels(1)
        handle.setsampwidth(2)
        handle.setframerate(8000)
        handle.writeframes(np.full(8000, 9000, np.int16).tobytes())
    session_file = str(tmp_path / "sess.json")
    with open(session_file, "w") as handle:
        json.dump({"segments": [
            {"id": "a", "start": 0, "end": 1, "label": "One",
             "custom_audio_path": wav}]}, handle)

    cli.main(["builder", "new", "cliproj", "--output-root", root])
    folder = _last_json(capsys)["project_folder"]
    cli.main(["builder", "save", folder, "--session", session_file,
              "--audio", wav, "--output-root", root])
    saved = _last_json(capsys)
    assert saved["session"]["audio_path"].startswith(folder)
    cli.main(["builder", "list", "--output-root", root])
    assert [p["name"] for p in _last_json(capsys)["projects"]] == \
        ["cliproj"]
    segs_file = str(tmp_path / "segs.json")
    with open(segs_file, "w") as handle:
        json.dump([{"start": 0, "end": 1,
                    "custom_audio_path": wav}], handle)
    cli.main(["builder", "mix", folder, "--session", segs_file])
    assert _last_json(capsys)["duration"] == pytest.approx(1.0,
                                                           abs=0.02)
    zip_out = str(tmp_path / "pack.zip")
    cli.main(["builder", "export", folder, "-o", zip_out])
    assert os.path.isfile(_last_json(capsys)["zip_path"])
    cli.main(["builder", "import", zip_out, "--name", "copy",
              "--output-root", root])
    imported = _last_json(capsys)
    assert imported["imported_project_name"] == "copy"
    cli.main(["builder", "delete", imported["project_folder"],
              "--output-root", root])
    assert _last_json(capsys)["deleted"]


def test_builder_cli_save_without_session_keeps_timeline(tmp_path,
                                                         capsys):
    """`builder save` with no --session must not wipe an existing
    project's scenes (e.g. when only attaching audio)."""
    import wave

    root = str(tmp_path / "out")
    cli.main(["builder", "new", "keepme", "--output-root", root])
    folder = _last_json(capsys)["project_folder"]
    session_file = str(tmp_path / "sess.json")
    with open(session_file, "w") as handle:
        json.dump({"segments": [{"id": "a", "start": 0, "end": 4,
                                 "label": "One"}]}, handle)
    cli.main(["builder", "save", folder, "--session", session_file,
              "--output-root", root])
    _last_json(capsys)
    wav = str(tmp_path / "a.wav")
    with wave.open(wav, "wb") as handle:
        handle.setnchannels(1)
        handle.setsampwidth(2)
        handle.setframerate(8000)
        handle.writeframes(np.zeros(800, np.int16).tobytes())
    cli.main(["builder", "save", folder, "--audio", wav,
              "--output-root", root])
    saved = _last_json(capsys)
    assert [seg["label"] for seg in saved["session"]["segments"]] == \
        ["One"]
    assert saved["session"]["audio_path"].startswith(folder)


def test_humo_pipeline(click_wav, tmp_path, capsys):
    """humo plan/split-set/chunk on a WAV, then final + grid over
    generated set renders."""
    import cv2

    cli.main(["humo", "plan", click_wav, "--scene-duration", "3.88"])
    plan = json.loads(capsys.readouterr().out)
    assert plan["frames_per_scene"] == 97   # adjust_humo(round(25*3.88))
    assert plan["total_sets"] >= 1

    out_dir = str(tmp_path / "set0")
    cli.main(["humo", "split-set", click_wav, "--index", "0",
              "-o", out_dir])
    split = json.loads(capsys.readouterr().out)
    assert len(split["segments"]) == 16
    assert os.path.isfile(os.path.join(out_dir, "meta.json"))
    assert os.path.isfile(os.path.join(out_dir, "audio_16.wav"))

    cli.main(["humo", "chunk", click_wav, "--index", "1",
              "--fps", "25", "--humo-align", "-o", str(tmp_path)])
    chunk = json.loads(capsys.readouterr().out)
    assert chunk["frames_per_scene"] % 4 == 1
    assert chunk["preroll_frames"] == 6
    assert os.path.isfile(chunk["wav"])

    sets = tmp_path / "renders"
    sets.mkdir()
    for index, count in enumerate((4, 3)):
        writer = cv2.VideoWriter(
            str(sets / f"s{index}-audio.mp4"),
            cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (32, 24))
        for frame in range(count):
            writer.write(np.full((24, 32, 3), 50 * (frame + 1),
                                 np.uint8))
        writer.release()

    cli.main(["humo", "final", str(sets), "--threshold", "2"])
    final = json.loads(capsys.readouterr().out)
    assert not final["skipped"] and final["count"] == 2

    grid_path = str(tmp_path / "grid.mp4")
    cli.main(["humo", "grid", str(sets), "-o", grid_path])
    grid = json.loads(capsys.readouterr().out)
    assert grid["frames"] >= 4 and os.path.isfile(grid_path)


def test_workflow_cli(tmp_path, capsys, monkeypatch):
    monkeypatch.setenv("VRGDG_TPU_MODELS", str(tmp_path / "models"))
    loras = tmp_path / "models" / "loras"
    loras.mkdir(parents=True)
    (loras / "x.safetensors").write_bytes(b"x")
    from vrgdg_tpu.api import workflow_runner as wr
    wr.set_default_catalog(None)
    try:
        cli.main(["workflow", "list"])
        listing = _last_json(capsys)
        assert "zimage" in listing["builders"]
        assert "clear_memory" in listing["builders"]

        cli.main(["workflow", "lora-list"])
        assert _last_json(capsys)["loras"] == ["[none]", "x.safetensors"]

        payload = tmp_path / "p.json"
        payload.write_text(json.dumps({"prompt": "a red door", "seed": 6,
                                       "use_custom_loras": True,
                                       "lora_count": 1,
                                       "lora_1": "x.safetensors"}))
        out = tmp_path / "prompt.json"
        cli.main(["workflow", "build", "zimage",
                  "--payload", f"@{payload}", "-o", str(out)])
        echoed = _last_json(capsys)
        assert echoed["builder"] == "zimage"
        built = json.loads(out.read_text())
        assert built["used_seed"] == 6
        assert built["prompt"]["971"]["inputs"]["text"] == "a red door"
        assert built["prompt"]["984"]["inputs"]["lora_1"] == "x.safetensors"

        cli.main(["workflow", "build", "clear_memory"])
        assert "prompt" in _last_json(capsys)
    finally:
        wr.set_default_catalog(None)


def test_graph_cli(tmp_path, capsys):
    cli.main(["graph", "lora-plan", "--payload", json.dumps(
        {"use_custom_loras": True, "lora_count": 1,
         "ltx_two_pass_mode": True,
         "lora_1": "style.safetensors", "strength_1": 0.8})])
    plan = _last_json(capsys)
    assert plan["first_pass"] == [["style.safetensors", 0.4]]
    assert plan["second_pass"] == [["style.safetensors", 0.8]]

    out = tmp_path / "events.json"
    cli.main(["graph", "state-plan", "--payload", json.dumps(
        {"mode": "mute", "node_ids": "3;4", "set_state": False,
         "off_mode": "bypass"}), "-o", str(out)])
    events = json.loads(out.read_text())["events"]
    assert [e[0] for e in events] == ["impact-bridge-continue"] * 2
    assert events[1][1]["bypasses"] == ["4"]


def test_cli_help_and_all_subcommand_parsers(capsys):
    """Every subcommand's parser builds and prints help without error —
    catches argparse wiring regressions (duplicate flags, bad choices)."""
    with pytest.raises(SystemExit) as exc:
        cli.main(["--help"])
    assert exc.value.code == 0
    help_text = capsys.readouterr().out
    for name in ("grain", "lut", "adjust", "grade", "enhance", "face-fix",
                 "compare", "luts", "make-lut", "probe", "beats",
                 "scene-srt", "audio", "builder", "lyrics", "llm-batch",
                 "humo", "workflow", "graph", "serve"):
        assert name in help_text, name
        with pytest.raises(SystemExit) as sub:
            cli.main([name, "--help"])
        assert sub.value.code == 0, name
        assert capsys.readouterr().out
