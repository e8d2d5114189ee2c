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
