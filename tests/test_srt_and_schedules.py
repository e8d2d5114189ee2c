"""SRT utilities (GeneralVideoNodes2.py:1139, GeneralVideoNodes.py:2980)
and sigma-transition schedules (CustomLTXNodes.py:20-127)."""

import json
import os
import time

import numpy as np
import pytest

from vrgdg_tpu.ops import schedules
from vrgdg_tpu.runtime import srt_tools

SRT = """1
00:00:00,000 --> 00:00:02,500
SCENE 1

2
00:00:02,500 --> 00:00:06,000
SCENE 2

3
00:00:06,000 --> 00:00:10,250
SCENE 3
"""


def test_scene_durations_and_lyric_merge():
    durations = srt_tools.scene_durations(SRT)
    assert durations == {1: 2.5, 2: 3.5, 3: 4.25}
    lyrics = {"lyricSegment1": "hello", "lyricSegment2": "world",
              "lyricSegment9": "missing", "metadata": "dropped"}
    merged = json.loads(srt_tools.merge_srt_lyrics(SRT, json.dumps(lyrics)))
    assert merged == {
        "lyricSegment1_Duration_2.500s": "hello",
        "lyricSegment2_Duration_3.500s": "world",
        "lyricSegment9_Duration_UNKNOWN": "missing",
    }


def test_latest_srt(tmp_path):
    main = tmp_path / "srt_files"
    legacy = tmp_path / "SRT_Files"
    main.mkdir()
    legacy.mkdir()
    assert srt_tools.latest_srt(str(main)) == ("", "")
    with pytest.raises(FileNotFoundError):
        srt_tools.latest_srt(str(main), require=True)
    old = legacy / "old.srt"
    old.write_text("1\n")
    os.utime(old, (time.time() - 100, time.time() - 100))
    new = main / "new.srt"
    new.write_text("1\n")
    path, name = srt_tools.latest_srt(str(main), str(legacy))
    assert name == "new.srt" and path == str(new)
    future = time.time() + 50
    os.utime(old, (future, future))  # now newest
    assert srt_tools.latest_srt(str(main), str(legacy))[1] == "old.srt"


def test_interpolation_factors():
    assert schedules.interpolation_factor("linear", 0.5) == 0.5
    assert schedules.interpolation_factor("ease_in", 0.5) == 0.25
    assert schedules.interpolation_factor("ease_out", 0.5) == 0.75
    with pytest.raises(ValueError, match="interpolation"):
        schedules.interpolation_factor("bounce", 0.5)


def test_build_transition_values_hold_and_window():
    sigmas = np.linspace(1.0, 0.0, 11)  # 10 transitions
    _, values = schedules.build_transition_values(
        sigmas, 6.0, 2.0, "linear", 0.2, 0.8)
    assert len(values) == 10
    assert values[0] == values[1] == 6.0        # hold start before ramp
    assert values[9] == 2.0                     # hold end after ramp
    ramp = values[2:9]
    assert ramp[0] == 6.0 and ramp[-1] == 2.0
    assert all(a >= b for a, b in zip(ramp, ramp[1:]))  # monotone down
    # neutral outside value
    _, values = schedules.build_transition_values(
        sigmas, 6.0, 2.0, "linear", 0.2, 0.8, outside_value=1.0)
    assert values[0] == 1.0 and values[9] == 1.0
    # degenerate single-transition window uses the start value
    _, values = schedules.build_transition_values(
        sigmas, 6.0, 2.0, "ease_in", 0.5, 0.5)
    assert values[5] == 6.0
    with pytest.raises(ValueError, match="start_percent"):
        schedules.build_transition_values(sigmas, 1, 2, "linear", 0.9, 0.1)
    with pytest.raises(ValueError, match="at least two"):
        schedules.build_transition_values([1.0], 1, 2)
    with pytest.raises(ValueError, match="finite"):
        schedules.build_transition_values([1.0, np.nan], 1, 2)


def test_runtime_offset_and_transition_index():
    full = np.array([1.0, 0.8, 0.6, 0.4, 0.2, 0.0])
    assert schedules.runtime_schedule_offset(full, full) == 0
    assert schedules.runtime_schedule_offset(full, full[2:]) == 2
    with pytest.raises(ValueError, match="not part"):
        schedules.runtime_schedule_offset(full, [0.9, 0.7])
    # exact hit, interior hit, out-of-range nearest
    assert schedules.current_transition_index(full, 0.8) == 1
    assert schedules.current_transition_index(full, 0.55) == 2
    assert schedules.current_transition_index(full, 5.0) == 0
    assert schedules.schedule_index(full, full[2:], 0.4) == 3


class TestStrengthSchedules:
    """Per-temporal-tile schedules (VRGDG_LTXLoopingSampler.py:133-164)."""

    def test_parse_and_lookup(self):
        from vrgdg_tpu.ops import parse_strength_schedule, scheduled_strength

        sched = parse_strength_schedule("0.8, 0.65,0.5", fallback=1.0)
        assert sched == [0.8, 0.65, 0.5]
        # last value repeats past the end; empty text -> flat fallback
        assert scheduled_strength(sched, 0, 1.0) == 0.8
        assert scheduled_strength(sched, 7, 1.0) == 0.5
        assert parse_strength_schedule("", 0.25) == [0.25]
        assert scheduled_strength(None, 3, 0.4) == 0.4

    def test_parse_errors_name_position(self):
        import pytest

        from vrgdg_tpu.ops import parse_strength_schedule

        with pytest.raises(ValueError, match="item 2 is empty"):
            parse_strength_schedule("0.5,,0.3", 1.0)
        with pytest.raises(ValueError, match="item 2 is not a number"):
            parse_strength_schedule("0.5,x", 1.0)
        with pytest.raises(ValueError, match="item 1 was 1.5"):
            parse_strength_schedule("1.5", 1.0)


class TestFirstLastBlend:
    """Temporal blend guide (VRGDG_LTXFirstLastGuide.py:33-70)."""

    def test_guide_frame_count(self):
        from vrgdg_tpu.ops import guide_frame_count

        assert guide_frame_count(13, 8) == 97
        assert guide_frame_count(1, 8) == 1

    def test_blend_endpoints_and_window(self):
        import numpy as np

        from vrgdg_tpu.ops import first_last_blend

        first = np.zeros((4, 6, 3), np.float32)
        last = np.ones((4, 6, 3), np.float32)
        out = np.asarray(first_last_blend(first, last, 9,
                                          transition_start=0.0,
                                          transition_end=1.0,
                                          curve="linear"))
        assert out.shape == (9, 4, 6, 3)
        np.testing.assert_allclose(out[0], 0.0, atol=1e-6)
        np.testing.assert_allclose(out[-1], 1.0, atol=1e-6)
        np.testing.assert_allclose(out[4], 0.5, atol=1e-6)
        # frames before transition_start stay at `first`
        out2 = np.asarray(first_last_blend(first, last, 9,
                                           transition_start=0.5,
                                           transition_end=0.9))
        np.testing.assert_allclose(out2[:4], 0.0, atol=1e-6)

    def test_curves_match_reference_formulas(self):
        import numpy as np

        from vrgdg_tpu.ops import apply_curve

        x = np.linspace(0.0, 1.0, 11, dtype=np.float32)
        np.testing.assert_allclose(np.asarray(apply_curve(x, "ease_in")),
                                   x * x, atol=1e-6)
        np.testing.assert_allclose(np.asarray(apply_curve(x, "ease_out")),
                                   1 - (1 - x) ** 2, atol=1e-6)
        np.testing.assert_allclose(np.asarray(apply_curve(x, "smoothstep")),
                                   x * x * (3 - 2 * x), atol=1e-6)

    def test_mismatched_last_is_resampled(self):
        import numpy as np

        from vrgdg_tpu.ops import first_last_blend

        first = np.zeros((8, 8, 3), np.float32)
        last = np.ones((4, 4, 3), np.float32)
        out = np.asarray(first_last_blend(first, last, 5))
        assert out.shape == (5, 8, 8, 3)
