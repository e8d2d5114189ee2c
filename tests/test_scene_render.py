"""Scene-render family vs the reference, with ffmpeg faked on BOTH
sides (this image ships no ffmpeg binary): the fake runner records every
command and fabricates decodable outputs, so the comparison locks the
full *plan* — command sequences, temp-file lifecycle, result dicts —
while the pixel work stays ffmpeg's on machines that have it."""

import os
import shutil
import subprocess
import time
import types

import pytest

from tests.reference_oracle import load_reference
from vrgdg_tpu.api import scene_render as sr

REF_FILE = "VRGDG_WorkflowRunnerNodes.py"

_CLOSURE = [
    "_safe_subfolder_path", "_resolve_comfy_image_path",
    "_resolve_save_folder", "_unique_copy_path", "_save_generated_image",
    "_find_ffmpeg_path", "_ffprobe_path_for", "_probe_video_size",
    "_normalize_video_canvas", "_scene_video_thumbnail_path",
    "_create_scene_video_thumbnail", "_safe_project_subfolder",
    "_unique_final_video_path", "_concat_file_path",
    "_cleanup_video_scratch_folders", "_retry_file_op",
    "_wait_for_stable_readable_file", "_replace_file_with_retry",
    "_collect_scene_video", "_trim_scene_video",
    "_apply_scene_start_color_match", "_find_scene_video_output",
    "_stitch_scene_videos", "_render_image_slideshow", "_int_payload",
    "_bool_payload",
]


class _FakeRun:
    """Records commands; creates decodable outputs so isfile/size checks
    and PIL frame grabs succeed."""

    def __init__(self):
        self.commands = []
        self.cubes = []

    def _result(self, returncode=0, stdout="", stderr=""):
        return types.SimpleNamespace(returncode=returncode, stdout=stdout,
                                     stderr=stderr)

    def __call__(self, cmd, capture_output=True, text=True, errors=None,
                 cwd=None, check=False):
        cmd = [str(part) for part in cmd]
        if cmd[-1] == "-version":
            return self._result()
        self.commands.append(cmd)
        exe = os.path.basename(cmd[0])
        if "ffprobe" in exe:
            return self._result(stdout="640x360\n")
        # snapshot any LUT the filter graph consumes before cleanup
        for part in cmd:
            if "lut3d=file=" in part:
                name = part.split("lut3d=file='", 1)[1].split("'", 1)[0]
                path = os.path.join(cwd or ".", name)
                if os.path.isfile(path):
                    with open(path, "rb") as handle:
                        self.cubes.append(handle.read())
        target = cmd[-1]
        ext = os.path.splitext(target)[1].lower()
        if ext in {".mp4", ".m4a", ".jpg"}:
            with open(target, "wb") as handle:
                handle.write(b"fake-media")
        elif ext == ".png":
            from PIL import Image

            # deterministic gradient keyed by basename so both sides'
            # frame grabs produce identical statistics
            seed = sum(os.path.basename(target).encode())
            image = Image.new("RGB", (8, 8))
            image.putdata([((seed + i * 7) % 256, (seed * 3 + i) % 256,
                            (seed + i * 13) % 256) for i in range(64)])
            image.save(target)
        return self._result()


class _FakeSubprocessModule:
    CalledProcessError = subprocess.CalledProcessError

    def __init__(self, run):
        self.run = run


@pytest.fixture()
def fake_ffmpeg(monkeypatch):
    """One recorder per side; freeze naming clocks so generated paths
    line up across the two implementations."""
    from vrgdg_tpu.runtime import video_io

    mine, theirs = _FakeRun(), _FakeRun()

    def my_runner(cmd, *, check=False, cwd=None):
        result = theirs_aware = mine(cmd, cwd=cwd, check=check)
        return result

    sr.set_ffmpeg_runner(my_runner)
    monkeypatch.setattr(video_io, "find_ffmpeg", lambda: "ffmpeg")
    monkeypatch.setattr(time, "strftime",
                        lambda fmt, *a: "20990101_000000")
    real_time = time.time
    monkeypatch.setattr(time, "time", lambda: 1234.5)
    yield {"mine": mine, "theirs": theirs}
    sr.set_ffmpeg_runner(None)
    assert time.time  # monkeypatch restores on teardown


@pytest.fixture(scope="module")
def ref():
    return load_reference(REF_FILE, _CLOSURE, extra_globals={
        "print": lambda *a, **k: None,
    })


def _ref_env(ref, runner, out_dir, input_dir="", temp_dir=""):
    """Point the reference's globals at a fake folder_paths + recorder."""
    fake_fp = types.SimpleNamespace(
        get_output_directory=lambda: out_dir,
        get_input_directory=lambda: input_dir or out_dir,
        get_temp_directory=lambda: temp_dir or out_dir)
    ref["folder_paths"] = fake_fp
    ref["subprocess"] = _FakeSubprocessModule(runner)
    return ref


def _make_clip(path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as handle:
        handle.write(b"clip-bytes-" + os.path.basename(path).encode())


def _project(tmp_path, name):
    project = tmp_path / name
    project.mkdir()
    return str(project)


def test_collect_parity(ref, tmp_path, fake_ffmpeg):
    for case, action in enumerate(["overwrite", "backup", "overwrite"]):
        mine_proj = _project(tmp_path, f"mine{case}")
        ref_proj = _project(tmp_path, f"ref{case}")
        results = []
        for side, project in (("mine", mine_proj), ("ref", ref_proj)):
            scratch = os.path.join(project, "image_to_video_clips_x")
            source = os.path.join(scratch, "video_0001_take-audio.mp4")
            _make_clip(source)
            if case == 2:  # existing target to overwrite
                _make_clip(os.path.join(project, "rendered_scene_videos",
                                        "video_0003-audio.mp4"))
            payload = {"source_path": source, "project_folder": project,
                       "scene_number": 3, "existing_action": action}
            if side == "mine":
                results.append(sr.collect_scene_video(payload))
            else:
                _ref_env(ref, fake_ffmpeg["theirs"], str(tmp_path))
                results.append(ref["_collect_scene_video"](payload))
        mine, theirs = results
        for key in ("existing_action", "backup_path", "removed_files"):
            assert os.path.relpath(str(mine[key]), mine_proj) == \
                os.path.relpath(str(theirs[key]), ref_proj) \
                if isinstance(mine[key], str) and mine[key] else \
                mine[key] == theirs[key]
        assert os.path.relpath(mine["video_path"], mine_proj) == \
            os.path.relpath(theirs["video_path"], ref_proj)
        assert os.path.isfile(mine["video_path"])
        # the -audio sibling preference fired on both sides
        assert mine["source_path"].endswith("-audio.mp4")


def test_trim_and_find_parity(ref, tmp_path, fake_ffmpeg):
    mine_proj = _project(tmp_path, "mine_t")
    ref_proj = _project(tmp_path, "ref_t")
    outs = []
    for side, project in (("mine", mine_proj), ("ref", ref_proj)):
        source = os.path.join(project, "clips", "take.mp4")
        _make_clip(source)
        payload = {"source_path": source, "project_folder": project,
                   "scene_number": 2, "start": 1.25, "duration": 3.5,
                   "label": "Best Take!", "mark_as_audio_video": True}
        if side == "mine":
            outs.append(sr.trim_scene_video(payload))
        else:
            _ref_env(ref, fake_ffmpeg["theirs"], str(tmp_path))
            outs.append(ref["_trim_scene_video"](payload))
    mine, theirs = outs
    assert os.path.relpath(mine["video_path"], mine_proj) == \
        os.path.relpath(theirs["video_path"], ref_proj)
    assert mine["start"] == theirs["start"]
    assert mine["duration"] == theirs["duration"]
    # trim command args identical modulo the project prefix
    my_cmd = fake_ffmpeg["mine"].commands[0]
    their_cmd = fake_ffmpeg["theirs"].commands[0]
    norm = [arg.replace(mine_proj, "P") for arg in my_cmd]
    norm_ref = [arg.replace(ref_proj, "P") for arg in their_cmd]
    assert norm == norm_ref

    # find: both sides score the -audio.mp4 renders identically
    finds = []
    for side, project in (("mine", mine_proj), ("ref", ref_proj)):
        folder = os.path.join(project, "image_to_video_clips_a")
        _make_clip(os.path.join(folder, "video_0002-audio.mp4"))
        _make_clip(os.path.join(folder, "video_0009_x-audio.mp4"))
        payload = {"project_folder": project, "scene_number": 2}
        if side == "mine":
            finds.append(sr.find_scene_video_output(payload))
        else:
            finds.append(ref["_find_scene_video_output"](payload))
    mine_f, theirs_f = finds
    assert os.path.relpath(mine_f["video_path"], mine_proj) == \
        os.path.relpath(theirs_f["video_path"], ref_proj)
    assert mine_f["video_path"].endswith("video_0002-audio.mp4")


def test_stitch_scene_videos_parity(ref, tmp_path, fake_ffmpeg):
    """The full stitch plan: timeline sync, concat, inserts, canvas,
    scene audio, mux — identical command sequences and result dicts."""
    outs, cmds = [], []
    projects = {}
    for side in ("mine", "ref"):
        project = _project(tmp_path, f"{side}_s")
        projects[side] = project
        scenes, audio_items = [], []
        for index in range(1, 4):
            clip = os.path.join(project, "rendered_scene_videos",
                                f"video_{index:04d}-audio.mp4")
            _make_clip(clip)
            scenes.append(clip)
            wav = os.path.join(project, f"scene_{index}.wav")
            _make_clip(wav)
            audio_items.append({"path": wav, "start": 0.5 * index,
                                "duration": 2.0 + index})
        insert = os.path.join(project, "insert.mp4")
        _make_clip(insert)
        # a stale scratch folder that the cleanup must remove
        os.makedirs(os.path.join(project, "text_to_video_clips_old"),
                    exist_ok=True)
        payload = {
            "project_folder": project,
            "scene_paths": scenes,
            "scene_audio_items": audio_items,
            "overlay_items": [{"path": insert, "start": 1.0, "end": 2.5,
                               "source_start": 0.25}],
            "scene_timing_items": [{"start": 0.0, "end": 2.0},
                                   {"start": 2.0, "end": 4.5},
                                   {"start": 4.5, "end": 6.0}],
            "timeline_fps": 24,
            "width": 1280, "height": 720,
            "output_prefix": "FINAL_VIDEO",
        }
        runner = fake_ffmpeg[side if side == "mine" else "theirs"]
        before = len(runner.commands)
        if side == "mine":
            outs.append(sr.stitch_scene_videos(payload))
        else:
            _ref_env(ref, runner, str(tmp_path))
            outs.append(ref["_stitch_scene_videos"](payload))
        cmds.append([[arg.replace(project, "P") for arg in cmd]
                     for cmd in runner.commands[before:]])
    mine, theirs = outs
    assert cmds[0] == cmds[1], "ffmpeg command plans diverged"
    for key in ("scene_count", "insert_count", "used_scene_audio",
                "normalized_canvas", "timeline_frame_sync", "timeline_fps",
                "timeline_frame_count", "output_width", "output_height",
                "concat_file", "used_embedded_scene_audio"):
        assert mine[key] == theirs[key], key
    assert os.path.relpath(mine["final_video_path"], projects["mine"]) == \
        os.path.relpath(theirs["final_video_path"], projects["ref"])
    assert [os.path.relpath(p, projects["mine"])
            for p in mine["removed_scratch_folders"]] == \
        [os.path.relpath(p, projects["ref"])
         for p in theirs["removed_scratch_folders"]]
    assert not os.path.isdir(os.path.join(projects["mine"],
                                          "text_to_video_clips_old"))


def test_color_match_parity(ref, tmp_path, fake_ffmpeg):
    outs, cubes = [], []
    for side in ("mine", "ref"):
        project = _project(tmp_path, f"{side}_c")
        prev = os.path.join(project, "rendered_scene_videos",
                            "video_0001-audio.mp4")
        clip = os.path.join(project, "rendered_scene_videos",
                            "video_0002-audio.mp4")
        _make_clip(prev)
        _make_clip(clip)
        payload = {"project_folder": project, "video_path": clip,
                   "reference_video_path": prev, "fade_seconds": 1.5,
                   "strength": 0.7}
        runner = fake_ffmpeg[side if side == "mine" else "theirs"]
        if side == "mine":
            outs.append(sr.match_scene_start_color(payload))
        else:
            _ref_env(ref, runner, str(tmp_path))
            outs.append(ref["_apply_scene_start_color_match"](payload))
        cubes.append(runner.cubes[-1])
    mine, theirs = outs
    assert mine["applied"] and theirs["applied"]
    assert mine["fade_seconds"] == theirs["fade_seconds"]
    assert mine["strength"] == theirs["strength"]
    # the baked correction LUT is byte-identical (same stats math)
    assert cubes[0] == cubes[1]


def test_slideshow_parity(ref, tmp_path, fake_ffmpeg):
    from PIL import Image

    outs, cmds = [], []
    projects = {}
    for side in ("mine", "ref"):
        project = _project(tmp_path, f"{side}_ss")
        projects[side] = project
        items = []
        for index in range(1, 3):
            image_path = os.path.join(project, f"scene_{index}.png")
            Image.new("RGB", (16, 9), (index * 40, 10, 200)).save(image_path)
            items.append({"path": image_path, "duration": 1.5 * index})
        audio = os.path.join(project, "mix.wav")
        _make_clip(audio)
        payload = {"project_folder": project, "image_items": items,
                   "audio_path": audio, "audio_start": 2.0,
                   "width": 640, "height": 360, "fps": 12}
        runner = fake_ffmpeg[side if side == "mine" else "theirs"]
        before = len(runner.commands)
        if side == "mine":
            outs.append(sr.render_image_slideshow(payload))
        else:
            _ref_env(ref, runner, str(tmp_path))
            outs.append(ref["_render_image_slideshow"](payload))
        cmds.append([["SCRATCH" if "_slideshow_" in arg else
                      arg.replace(project, "P") for arg in cmd]
                     for cmd in runner.commands[before:]])
    mine, theirs = outs
    assert cmds[0] == cmds[1], "slideshow command plans diverged"
    for key in ("scene_count", "duration", "audio_start", "output_width",
                "output_height", "fps"):
        assert mine[key] == theirs[key], key


def test_save_generated_image_parity(ref, tmp_path, fake_ffmpeg,
                                     monkeypatch):
    mine_out = tmp_path / "mine_out"
    ref_out = tmp_path / "ref_out"
    for out in (mine_out, ref_out):
        (out / "renders").mkdir(parents=True)
        (out / "renders" / "gen_0001.png").write_bytes(b"png")
    monkeypatch.setattr(sr, "DEFAULT_OUTPUT_ROOT", str(mine_out))
    payload = {"image": {"filename": "gen_0001.png",
                         "subfolder": "renders", "type": "output"},
               "save_folder": "Approved"}
    mine = sr.save_generated_image(payload)
    _ref_env(ref, fake_ffmpeg["theirs"], str(ref_out))
    theirs = ref["_save_generated_image"](payload)
    assert os.path.relpath(mine["saved_path"], str(mine_out)) == \
        os.path.relpath(theirs["saved_path"], str(ref_out))
    assert os.path.isfile(mine["saved_path"])
    # traversal refused identically
    bad = {"image": {"filename": "gen_0001.png", "subfolder": "../..",
                     "type": "output"}}
    with pytest.raises(ValueError):
        sr.save_generated_image(bad)
    with pytest.raises(ValueError):
        ref["_save_generated_image"](bad)


def test_ffmpeg_missing_is_loud(monkeypatch):
    from vrgdg_tpu.runtime import video_io

    monkeypatch.setattr(video_io, "find_ffmpeg", lambda: "")
    with pytest.raises(RuntimeError, match="FFmpeg was not found"):
        sr.find_ffmpeg_path()


def test_retry_file_op_semantics(monkeypatch):
    """Lock the restyled retry helper: sharing violations retry with the
    reference's failure text (:3341-3363); other OSErrors propagate."""
    monkeypatch.setattr(time, "sleep", lambda _s: None)

    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise PermissionError("locked")
        return "done"

    assert sr.retry_file_op(flaky, "Copy") == "done"
    assert calls["n"] == 3

    win32 = OSError("sharing violation")
    win32.winerror = 32
    with pytest.raises(RuntimeError, match="Move failed because the file "
                                           "stayed locked"):
        sr.retry_file_op(lambda: (_ for _ in ()).throw(win32), "Move",
                         attempts=2)

    def hard_fail():
        raise OSError("disk gone")

    with pytest.raises(OSError, match="disk gone"):
        sr.retry_file_op(hard_fail, "Copy", attempts=5)


def test_wait_for_stable_readable_file(tmp_path, monkeypatch):
    """Stability needs three consecutive identical non-zero sizes; a file
    that stays unreadable raises the locked error (:3413-3435)."""
    monkeypatch.setattr(time, "sleep", lambda _s: None)
    target = tmp_path / "out.mp4"
    sizes = iter([b"a", b"ab", b"abc", b"abc", b"abc"])

    real_probe = sr._probe_size
    def growing_probe(path):
        try:
            target.write_bytes(next(sizes))
        except StopIteration:
            pass
        return real_probe(path)

    monkeypatch.setattr(sr, "_probe_size", growing_probe)
    sr.wait_for_stable_readable_file(str(target), timeout=5.0)

    with pytest.raises(RuntimeError, match="still locked"):
        sr.wait_for_stable_readable_file(str(tmp_path / "missing.mp4"),
                                         timeout=0.6, interval=0.1)


def test_empty_project_folder_is_rejected_not_cwd(tmp_path):
    """abspath('') is the server CWD — blank folders must error loudly
    instead of scanning/mutating the process working directory."""
    with pytest.raises(ValueError, match="Project folder is empty"):
        sr.safe_project_subfolder("", "rendered_scene_videos")
    with pytest.raises(ValueError, match="empty or does not exist"):
        sr.find_scene_video_output({"project_folder": "  "})
