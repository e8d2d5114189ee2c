"""LLM JSON fixer family: oracle-fuzz vs VRGDG_GeneralNodes2.py.

Each suite extracts the reference class and fuzzes the re-derivation
in ``runtime/json_fixers.py`` against it on damaged LLM output:
success outputs (fixed text, JSON, was_fixed, notes, counts) compare
exactly; unrepairable inputs must raise on both sides.
"""

import json
import random

import pytest

from vrgdg_tpu.runtime import json_fixers as jf

from tests.reference_oracle import load_reference

_WORDS = ("hold", "run away", "neon \"rain\"", "ámbar", "it's",
          "slow push-in", "雨", "oh", "you", "the river")


def _ref(name):
    return load_reference("VRGDG_GeneralNodes2.py", [name],
                          extra_globals={"any_typ": "*"})[name]()


def _rng(seed):
    return random.Random(seed)


def _damage_json(rng, text):
    if rng.random() < 0.4:
        text = f"```json\n{text}\n```"
    if rng.random() < 0.3:
        text = "Sure! Here you go:\n" + text
    if rng.random() < 0.3:
        text = text.replace("{", "{ {", 1)
    if rng.random() < 0.3:
        text = text.replace("}", ",}", 1)
    if rng.random() < 0.2 and text.rstrip().endswith("}"):
        text = text.rstrip()[:-1]
    if rng.random() < 0.3:
        text = text.replace('"', "“", 1).replace('"', "”", 1)
    return text


def _compare(ours, theirs_tuple, keys):
    for value, key in zip(theirs_tuple, keys):
        assert ours[key] == value, key


def test_lyric_segment_fixer_parity():
    ref = _ref("VRGDG_LyricSegmentJsonFixer")
    rng = _rng(1)
    for case in range(200):
        count = rng.randrange(0, 7)
        style = rng.choice(["lyricSegment{i}", "segment{i}",
                            "LyricSegment {i}", "Segment_{i}",
                            "lyric{i}", "s{i}", "verse{i}"])
        payload = {style.replace("{i}", str(i + rng.choice([1, 3]))):
                   rng.choice(_WORDS) for i in range(1, count + 1)}
        text = _damage_json(rng, json.dumps(payload,
                                            ensure_ascii=False))
        try:
            expected = ref.fix_json(text)
            failed = False
        except ValueError:
            failed = True
        if failed:
            with pytest.raises(ValueError):
                jf.fix_lyric_segments_json(text)
        else:
            ours = jf.fix_lyric_segments_json(text)
            _compare(ours, expected, ("fixed_text", "data",
                                      "was_fixed", "notes"))


def test_lyric_segment_fixer_quote_repair():
    """The inner-quote escaper: unescaped quotes inside values."""
    ref = _ref("VRGDG_LyricSegmentJsonFixer")
    samples = [
        '{"lyricSegment1": "she said "hold" to me", '
        '"lyricSegment2": "ok"}',
        'noise before {"segment1": "a"} and after',
        '{"lyricSegment1": "a" "lyricSegment2": "b"}',
        '{ {"lyricSegment1": "x"}',
        "not json at all",
        "{}",
    ]
    for text in samples:
        try:
            expected = ref.fix_json(text)
        except ValueError:
            with pytest.raises(ValueError):
                jf.fix_lyric_segments_json(text)
            continue
        ours = jf.fix_lyric_segments_json(text)
        _compare(ours, expected, ("fixed_text", "data", "was_fixed",
                                  "notes"))


def test_lyric_segment_cleaner_parity():
    ref = _ref("VRGDG_LyricSegmentTextCleaner")
    rng = _rng(2)
    fillers = ["oh", "you", "oh oh oh oh oh", "run run run run",
               "", "love", "the", "hold me now", "la"]
    for _ in range(150):
        count = rng.randrange(0, 9)
        lines = []
        for i in range(1, count + 1):
            body = rng.choice(fillers + list(_WORDS))
            lines.append(f"lyricSegment{i} = {body}"
                         if rng.random() < 0.5
                         else f"lyricSegment{i}={body}")
            if rng.random() < 0.2:
                lines.append("# comment")
        text = "\n".join(lines)
        repeat = rng.choice([2, 3, 5])
        collapse = rng.choice([2, 4, 6])
        bridge = rng.random() < 0.7
        fill = rng.random() < 0.7
        expected = ref.clean(text, repeat, collapse, bridge, fill,
                             "Instrumental section.")
        ours = jf.clean_lyric_segments(
            text, repeat, collapse, bridge, fill,
            "Instrumental section.")
        assert ours["text"] == expected[0]
        assert ours["changed_count"] == expected[1]
        assert ours["notes"] == expected[2]


def test_prompt_map_fixer_parity(tmp_path):
    ref = _ref("VRGDG_PromptMapJsonFixer")
    rng = _rng(3)
    for case in range(150):
        count = rng.randrange(0, 7)
        style = rng.choice(["Prompt{i}", "prompt {i}", "Scene{i}",
                            "p-{i}", "text"])
        payload = {}
        for i in range(1, count + 1):
            key = style.replace("{i}", str(i))
            payload[key] = rng.choice(
                [rng.choice(_WORDS), f"line\nwith\nbreaks {i}",
                 i * 2, None])
        text = _damage_json(rng, json.dumps(payload,
                                            ensure_ascii=False))
        expected = ref.fix_json(text)
        ours = jf.fix_prompt_map_json(text)
        _compare(ours, expected, ("fixed_text", "data", "was_fixed",
                                  "notes", "prompt_count"))

    # SRT count validation, via file and raw text
    srt = ("1\n00:00:00,000 --> 00:00:02,000\nx\n\n"
           "2\n00:00:02,000 --> 00:00:04,000\ny\n")
    path = tmp_path / "scenes.srt"
    path.write_text(srt)
    good = '{"Prompt1": "a", "Prompt2": "b"}'
    for source in (str(path), srt):
        expected = ref.fix_json(good, use_srt_file=True,
                                srt_file=source)
        ours = jf.fix_prompt_map_json(good, srt_source=source)
        _compare(ours, expected, ("fixed_text", "data", "was_fixed",
                                  "notes", "prompt_count"))
    bad = '{"Prompt1": "a"}'
    with pytest.raises(ValueError):
        ref.fix_json(bad, use_srt_file=True, srt_file=srt)
    with pytest.raises(ValueError):
        jf.fix_prompt_map_json(bad, srt_source=srt)


def test_subject_prepender_parity():
    ref = _ref("VRGDG_PromptJsonSubjectPrepender")
    rng = _rng(4)
    for _ in range(100):
        count = rng.randrange(0, 5)
        payload = {f"Prompt{i}": rng.choice(
            ["a woman walks", "A Woman walks on", "", "rain falls"])
            for i in range(1, count + 1)}
        as_dict = rng.random() < 0.4
        source = payload if as_dict else _damage_json(
            rng, json.dumps(payload, ensure_ascii=False))
        subject = rng.choice(["a woman", "", "The Hero",
                              "a woman  walks"])
        separator = rng.choice([", ", " - ", ""])
        skip = rng.choice([True, False, "true", "false"])
        try:
            expected = ref.prepend_subject(subject, source, separator,
                                           skip)
            failed = False
        except ValueError:
            failed = True
        if failed:
            with pytest.raises(ValueError):
                jf.prepend_prompt_subject(subject, source, separator,
                                          skip)
            continue
        ours = jf.prepend_prompt_subject(subject, source, separator,
                                         skip)
        assert ours["fixed_text"] == expected[0]
        assert ours["data"] == expected[1]
        assert ours["prompt_count"] == expected[2]


def test_duration_merger_parity():
    ref = _ref("VRGDG_LyricSegmentDurationMerger")
    rng = _rng(5)

    def _srt(durations):
        cursor = 0.0
        blocks = []
        for number, span in enumerate(durations, 1):
            start = cursor
            cursor += span

            def _stamp(value):
                hours = int(value // 3600)
                minutes = int(value % 3600 // 60)
                secs = value % 60
                return (f"{hours:02d}:{minutes:02d}:"
                        f"{int(secs):02d},"
                        f"{int(round((secs % 1) * 1000)):03d}")

            blocks.append(f"{number}\n{_stamp(start)} --> "
                          f"{_stamp(cursor)}\nline")
        return "\n\n".join(blocks)

    for _ in range(100):
        count = rng.randrange(1, 6)
        prefix = rng.choice(["lyricSegment", "segment"])
        keys_sequential = rng.random() < 0.8
        payload = {}
        for i in range(1, count + 1):
            index = i if keys_sequential else i + 1
            payload[f"{prefix}{index}"] = rng.choice(_WORDS)
        srt = _srt([rng.uniform(0.5, 9)
                    for _ in range(count if rng.random() < 0.8
                                   else count + 1)])
        strict = rng.random() < 0.6
        decimals = rng.choice([0, 2, 3])
        use_srt = rng.random() < 0.85
        text = json.dumps(payload, ensure_ascii=False)
        try:
            expected = ref.merge(srt, text, strict, decimals, use_srt)
            failed = False
        except ValueError:
            failed = True
        if failed:
            with pytest.raises(ValueError):
                jf.merge_segment_durations(srt, text, strict,
                                           decimals, use_srt)
            continue
        ours = jf.merge_segment_durations(srt, text, strict, decimals,
                                          use_srt)
        assert ours["fixed_text"] == expected[0]
        assert ours["data"] == expected[1]
        assert ours["segment_count"] == expected[2]
        assert ours["duration_count"] == expected[3]


def test_story_group_fixer_parity():
    ref = _ref("VRGDG_StoryGroupJsonFixer")
    rng = _rng(6)
    for case in range(150):
        count = rng.randrange(0, 5)
        groups = []
        for i in range(1, count + 1):
            group = {"index": rng.choice([i, i, i, str(i), -1,
                                          i + 10]),
                     "subject": rng.choice(_WORDS),
                     "camera": rng.choice(_WORDS),
                     "scene_and_lighting": rng.choice(_WORDS),
                     "frame": rng.choice(_WORDS)}
            if rng.random() < 0.15:
                del group[rng.choice(["camera", "frame"])]
            if rng.random() < 0.1:
                group["subject"] = 42
            groups.append(group)
        payload = {"story_summary": " ".join(
            rng.choices(_WORDS, k=3)), "groups": groups}
        if rng.random() < 0.1:
            del payload["story_summary"]
        text = _damage_json(rng, json.dumps(payload,
                                            ensure_ascii=False))
        try:
            expected = ref.fix_json(text)
            failed = False
        except ValueError:
            failed = True
        if failed:
            with pytest.raises(ValueError):
                jf.fix_story_group_json(text)
        else:
            ours = jf.fix_story_group_json(text)
            _compare(ours, expected, ("fixed_text", "data",
                                      "was_fixed", "notes"))


def test_story_group_fixer_object_comma_repair():
    ref = _ref("VRGDG_StoryGroupJsonFixer")
    text = ('{"story_summary": "s", "groups": ['
            '{"index": 1, "subject": "a", "camera": "b", '
            '"scene_and_lighting": "c", "frame": "d"} '
            '{"index": 2, "subject": "e", "camera": "f", '
            '"scene_and_lighting": "g", "frame": "h"}]}')
    expected = ref.fix_json(text)
    ours = jf.fix_story_group_json(text)
    _compare(ours, expected, ("fixed_text", "data", "was_fixed",
                              "notes"))
    assert "inserted missing commas between objects" in ours["notes"]
