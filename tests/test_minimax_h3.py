"""MiniMax H3 timing + reference-media parsing — oracle fuzz.

The reference's timing module is ComfyUI-free, so every public function
is AST-extracted and fuzz-compared directly; the media module's pure
parsing half is extracted the same way (its loader half needs ComfyUI
VHS nodes and is re-derived as window math + PIL decoding).
"""

import math
import os
from dataclasses import dataclass, asdict
from decimal import Decimal, InvalidOperation, ROUND_CEILING
from typing import Optional

import numpy as np
import pytest

from vrgdg_tpu.runtime import minimax_h3 as mm

from tests.reference_oracle import load_reference


@pytest.fixture(scope="module")
def timing_oracle():
    return load_reference(
        "VRGDG_MiniMaxH3Timing.py",
        ["H3_FPS", "H3_FRAME_STEP", "H3_FRAME_OFFSET",
         "H3_MIN_FRAME_COUNT", "H3_MAX_FRAME_COUNT",
         "_decimal", "_non_negative_int", "_seconds",
         "align_h3_frame_count", "frames_covering_duration",
         "MiniMaxH3TimingPlan", "calculate_minimax_h3_timing"],
        extra_globals={"dataclass": dataclass, "asdict": asdict,
                       "Decimal": Decimal,
                       "InvalidOperation": InvalidOperation,
                       "ROUND_CEILING": ROUND_CEILING,
                       "Optional": Optional})


@pytest.fixture(scope="module")
def media_oracle():
    return load_reference(
        "VRGDG_MiniMaxH3ReferenceMedia.py",
        ["MAX_REFERENCE_IMAGES", "MAX_REFERENCE_VIDEOS",
         "REFERENCE_VIDEO_FPS", "REFERENCE_VIDEO_MAX_FRAMES",
         "_parse_path_values", "_clean_path", "_parse_image_paths",
         "_as_bool", "_as_nonnegative_float", "_parse_video_references"])


def test_grid_constants(timing_oracle, media_oracle):
    for name in ("H3_FPS", "H3_FRAME_STEP", "H3_FRAME_OFFSET",
                 "H3_MIN_FRAME_COUNT", "H3_MAX_FRAME_COUNT"):
        assert getattr(mm, name) == timing_oracle[name]
    for name in ("MAX_REFERENCE_IMAGES", "MAX_REFERENCE_VIDEOS",
                 "REFERENCE_VIDEO_FPS", "REFERENCE_VIDEO_MAX_FRAMES"):
        assert getattr(mm, name) == media_oracle[name]


def test_frame_grid_parity(timing_oracle):
    rng = np.random.default_rng(5)
    for value in list(range(0, 40)) + [361, 362, 363, 1000] + \
            [int(v) for v in rng.integers(0, 5000, 60)]:
        assert mm.align_h3_frame_count(value) == \
            timing_oracle["align_h3_frame_count"](value)
    for _ in range(80):
        dur = round(float(rng.uniform(0, 30)), int(rng.integers(0, 6)))
        fps = int(rng.integers(1, 61))
        assert mm.frames_covering_duration(dur, fps) == \
            timing_oracle["frames_covering_duration"](dur, fps)
    for bad in (-1, 2.5, "x", float("nan"), float("inf")):
        with pytest.raises(ValueError):
            timing_oracle["align_h3_frame_count"](bad)
        with pytest.raises(ValueError):
            mm.align_h3_frame_count(bad)


def _plans_equal(mine: dict, theirs: dict):
    assert set(mine) == set(theirs)
    for key, a in mine.items():
        b = theirs[key]
        if isinstance(a, int) and not isinstance(a, bool):
            assert a == b, key
        elif a is None or b is None:
            assert a is b, key
        else:
            assert math.isclose(a, b, rel_tol=0, abs_tol=2e-9), \
                (key, a, b)


def test_timing_plan_parity(timing_oracle):
    calc = timing_oracle["calculate_minimax_h3_timing"]
    rng = np.random.default_rng(17)
    checked = 0
    while checked < 150:
        start = round(float(rng.uniform(0, 200)), int(rng.integers(0, 4)))
        end = start + round(float(rng.uniform(0.05, 15)),
                            int(rng.integers(0, 4)))
        warm = int(rng.integers(0, 80))
        cool = int(rng.integers(0, 80))
        kwargs = {}
        if rng.random() < 0.5:
            kwargs["source_start_seconds"] = round(
                float(rng.uniform(0, 30)), 3)
        if rng.random() < 0.5:
            base = kwargs.get("source_start_seconds", start)
            kwargs["source_duration_seconds"] = round(
                base + (end - start) + float(rng.uniform(0, 10)), 3)
        try:
            theirs = calc(start, end, warm, cool, **kwargs).to_dict()
        except ValueError:
            with pytest.raises(ValueError):
                mm.calculate_minimax_h3_timing(start, end, warm, cool,
                                               **kwargs)
            continue
        mine = mm.calculate_minimax_h3_timing(start, end, warm, cool,
                                              **kwargs)
        _plans_equal(mine, theirs)
        checked += 1

    # handle clamping edge: no audio before the scene at all
    theirs = calc(0, 2, 24, 24, source_duration_seconds=2).to_dict()
    mine = mm.calculate_minimax_h3_timing(0, 2, 24, 24,
                                          source_duration_seconds=2)
    _plans_equal(mine, theirs)
    assert mine["actual_warmup_seconds"] == 0.0
    assert mine["actual_cooldown_seconds"] == 0.0

    for bad_kwargs in (
            {"timeline_start_seconds": -1, "timeline_end_seconds": 2},
            {"timeline_start_seconds": 3, "timeline_end_seconds": 3},
            {"timeline_start_seconds": 0, "timeline_end_seconds": 1,
             "source_start_seconds": 5, "source_duration_seconds": 4},
            {"timeline_start_seconds": 0, "timeline_end_seconds": 30,
             "max_frame_count": 100}):
        with pytest.raises(ValueError):
            calc(**bad_kwargs)
        with pytest.raises(ValueError):
            mm.calculate_minimax_h3_timing(**bad_kwargs)
    with pytest.raises(ValueError):
        mm.calculate_minimax_h3_timing(0, 1, fps=30)
    with pytest.raises(ValueError):
        calc(0, 1, fps=30)


def test_path_parsing_parity(media_oracle):
    cases = [
        "", "   ", "[]", '["a.png", "b.png"]',
        '{"image_paths": ["x.png"], "other": 1}',
        '{"images": ["y.png"]}', '{"foo": "bar", "baz": "qux"}',
        "one.png\ntwo.png\r\nthree.png", "  solo.mp4  ",
        '[{"path": "v.mp4", "start": 2}]', "not json {",
        '{"video_references": [{"file": "a.mp4"}]}',
    ]
    for raw in cases:
        for keys in ((), ("image_paths", "images"),
                     ("video_references", "videos")):
            assert mm.parse_path_values(raw, keys) == \
                media_oracle["_parse_path_values"](raw, keys), (raw, keys)
        assert mm.parse_image_paths(raw) == \
            media_oracle["_parse_image_paths"](raw), raw
        assert mm.parse_video_references(raw) == \
            media_oracle["_parse_video_references"](raw), raw

    for value in ("'quoted.png'", '"dq.mp4"', {"path": "p.mp4"},
                  {"file": "f.mov"}, {"image": "i.png"},
                  {"video": "v.avi"}, {"other": "x"}, None, 42, ""):
        assert mm.clean_media_path(value) == \
            media_oracle["_clean_path"](value), value

    for value in (True, False, None, "1", "true", "Yes ", "ON", "off",
                  "0", "no", 1, 0, 2.5, "maybe"):
        assert mm._as_bool(value) == media_oracle["_as_bool"](value)
    for value in (None, "x", -3, "2.5", 7, float("nan"), [1]):
        mine = mm._as_nonneg_float(value)
        theirs = media_oracle["_as_nonnegative_float"](value)
        assert (mine == theirs or
                (math.isnan(mine) and math.isnan(theirs))), value


def test_video_reference_fields_parity(media_oracle):
    raw = ('[{"path": "a.mp4", "start_seconds": 1.5, '
           '"duration_seconds": 4, "use_audio": "yes"}, '
           '{"file": "b.mp4", "seek_seconds": 2}, "bare.mp4", '
           '{"path": "c.mp4", "start": 9, "include_audio": true}]')
    assert mm.parse_video_references(raw) == \
        media_oracle["_parse_video_references"](raw)


def test_video_reference_window():
    skip, cap = mm.video_reference_window(
        {"start_seconds": 1.5, "duration": 4.0})
    assert (skip, cap) == (36, 96)
    skip, cap = mm.video_reference_window({})
    assert (skip, cap) == (0, mm.REFERENCE_VIDEO_MAX_FRAMES)
    # a tiny positive duration still loads at least one frame; long
    # windows clamp to the 15 s cap
    assert mm.video_reference_window({"duration": 0.001})[1] == 1
    assert mm.video_reference_window({"duration": 99})[1] == \
        mm.REFERENCE_VIDEO_MAX_FRAMES


def test_resolve_and_load_images(tmp_path):
    import cv2
    root_a = tmp_path / "a"
    root_b = tmp_path / "b"
    root_a.mkdir()
    root_b.mkdir()
    img = np.zeros((8, 8, 3), np.uint8)
    img[:, :, 1] = 200
    cv2.imwrite(str(root_b / "ref.png"), img)

    resolved = mm.resolve_media_path(
        "ref.png", roots=(str(root_a), str(root_b)))
    assert resolved == str(root_b / "ref.png")
    assert mm.resolve_media_path(resolved) == resolved
    with pytest.raises(FileNotFoundError):
        mm.resolve_media_path("missing.png", roots=(str(root_a),))
    with pytest.raises(FileNotFoundError):
        mm.resolve_media_path("")

    images = mm.load_reference_images(
        '["ref.png"]', roots=(str(root_b),))
    assert len(images) == 1 and images[0].shape == (8, 8, 3)
    assert images[0].dtype == np.float32
    assert abs(float(images[0][..., 1].mean()) - 200 / 255.0) < 1e-6

    too_many = "[" + ",".join(['"ref.png"'] * 10) + "]"
    with pytest.raises(ValueError):
        mm.load_reference_images(too_many, roots=(str(root_b),))


def test_h3_collection_numeric_payloads_do_not_recurse():
    """A float/int value round-trips json.loads as a NEW equal object;
    the identity-style recursion guard must not loop on it (the
    reference recurses forever here)."""
    from vrgdg_tpu.api.workflow_runner import _h3_collection

    assert _h3_collection(1.5) == ["1.5"]
    assert _h3_collection(7) == ["7"]
    assert _h3_collection(True) == ["True"]
    # string parses still peel quotes like the reference
    assert _h3_collection('"/a/b.png"') == ["/a/b.png"]
    assert _h3_collection('["x.png", "y.png"]') == ["x.png", "y.png"]
