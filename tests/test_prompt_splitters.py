"""Prompt splitter family: oracle-fuzz vs HumoAutomationExtra2.py.

One fuzz suite per splitter variant plus the text builders — the
table-driven engine in ``runtime/prompt_splitters.py`` must match the
reference's seven classes output-for-output, including their
swallow-errors-into-empties contracts.
"""

import json
import random

from vrgdg_tpu.runtime import prompt_splitters as ps

from tests.reference_oracle import load_reference

_WORDS = ("dawn", "neon rain", "wide shot", "ámbar", "雨", "it's",
          "slow push-in.", "Cut!", "why?")


def _rng(seed):
    return random.Random(seed)


def _ref(name):
    return load_reference("HumoAutomationExtra2.py", [name])[name]()


def _keys(rng, count):
    styles = (lambda i: f"prompt{i}", lambda i: f"Prompt#{i}",
              lambda i: f"p{i:02d}x", lambda i: f"scene {i}",
              lambda i: rng.choice(["intro", "outro", "notes"]))
    style = rng.choice(styles)
    seen = []
    for i in rng.sample(range(1, 40), count):
        key = style(i)
        if key not in seen:
            seen.append(key)
    return seen


def _payload(rng, value_maker):
    data = {key: value_maker(rng) for key in _keys(rng,
                                                   rng.randrange(0, 9))}
    roll = rng.random()
    if roll < 0.25:
        return [value_maker(rng) for _ in range(rng.randrange(0, 9))]
    if roll < 0.35:
        return rng.choice(["plain text", 7, None])
    return data


def _any_value(rng):
    roll = rng.random()
    if roll < 0.5:
        return rng.choice(_WORDS)
    if roll < 0.7:
        return [rng.choice(_WORDS) for _ in range(rng.randrange(0, 4))]
    if roll < 0.85:
        return {"text": rng.choice(_WORDS), "n": rng.randrange(9)}
    return rng.randrange(100)


def _text_of(rng, payload, damage=False):
    text = json.dumps(payload, ensure_ascii=False)
    if damage:
        if rng.random() < 0.4:
            text = f"```json\n{text}\n```"
        if rng.random() < 0.3:
            text = text.replace('"', "`\"", 1)
        if rng.random() < 0.2:
            text = text[:-1]
    return text


def test_manual_splitter_parity():
    ref = _ref("VRGDG_PromptSplitterForManual")
    rng = _rng(11)
    for _ in range(200):
        text = _text_of(rng, _payload(rng, _any_value),
                        damage=rng.random() < 0.3)
        index = rng.randrange(0, 3)
        assert list(ref.split_prompt(text, index)) == \
            ps.split_prompts("manual", text, index)


def test_fmml_splitter_parity():
    ref = _ref("VRGDG_PromptSplitterForFMML")
    rng = _rng(22)
    for _ in range(200):
        text = _text_of(rng, _payload(rng, _any_value),
                        damage=rng.random() < 0.3)
        index = rng.randrange(0, 3)
        assert list(ref.split_prompt(text, index)) == \
            ps.split_prompts("fmml", text, index)


def test_quad_splitter_parity():
    ref = _ref("VRGDG_PromptSplitter4")
    rng = _rng(33)
    for _ in range(200):
        text = _text_of(rng, _payload(rng, _any_value),
                        damage=rng.random() < 0.5)
        assert list(ref.split_prompt(text)) == \
            ps.split_prompts("quad", text)


def test_pair_splitter_parity():
    ref = _ref("VRGDG_PromptSplitter2")
    rng = _rng(44)
    for case in range(200):
        if case % 5 == 0:
            # the brace-repair path: bare "Prompt1": "text" payloads
            text = f'"Prompt{rng.randrange(1, 4)}": ' \
                f'"{rng.choice(_WORDS)}", '
        else:
            text = _text_of(rng, _payload(rng, _any_value),
                            damage=rng.random() < 0.5)
        assert list(ref.split_prompt(text)) == \
            ps.split_prompts("pair", text)


def test_first_last_splitter_parity():
    ref = _ref("VRGDG_PromptSplitterForFL")

    def _fl_value(rng):
        if rng.random() < 0.7:
            return {"first": rng.choice(_WORDS),
                    "last": rng.choice(_WORDS)}
        return _any_value(rng)

    rng = _rng(55)
    for _ in range(200):
        text = _text_of(rng, _payload(rng, _fl_value),
                        damage=rng.random() < 0.2)
        index = rng.randrange(0, 2)
        assert list(ref.split(text, index)) == \
            ps.split_prompts("first_last", text, index)


def test_t2i_i2v_parity():
    ref = _ref("VRGDG_SplitPrompt_T2I_I2V")
    rng = _rng(66)
    for case in range(150):
        payload = {"t2i": rng.choice(_WORDS)}
        if rng.random() < 0.8:
            payload["i2v"] = rng.choice(_WORDS) if rng.random() < 0.5 \
                else [rng.choice(_WORDS), "", rng.choice(_WORDS)]
        text = json.dumps(payload, ensure_ascii=False)
        if rng.random() < 0.5:
            text = f"```json\n{text}\n```"
        if case % 9 == 0:
            text = text[:-2]
        if case % 17 == 0:
            text = ""
        assert tuple(ref.split(text)) == ps.split_t2i_i2v(text)


def test_smart_split_two_parity():
    ref = _ref("VRGDG_SmartSplitTextTwo")
    rng = _rng(77)
    samples = [
        "",
        "one line only",
        "First line\nand the rest\nwith more",
        "escaped\\nnewline transport",
        "CRLF\r\nstyle",
        "Sentence one. Sentence two! Sentence three? Four.",
        "nosentencemarkersatallhere",
        "Short. " * 9,
    ]
    for _ in range(60):
        samples.append(" ".join(rng.choices(
            _WORDS + ("\n", "\\n", "\r"), k=rng.randrange(1, 12))))
    for text in samples:
        assert tuple(ref.split(text)) == ps.split_text_two(text)


def test_template_builder_parity():
    ref = _ref("VRGDG_PromptTemplateBuilder")
    rng = _rng(88)
    types = ["Theme / Style", "Instructions", "Story", "Ideas",
             "Other Notes"]
    for _ in range(60):
        sections = [(rng.choice(types),
                     rng.choice(["", "   ", rng.choice(_WORDS),
                                 f"  {rng.choice(_WORDS)}\n"]))
                    for _ in range(5)]
        flat = [part for pair in sections for part in pair]
        assert ref.build(*flat) == (ps.build_prompt_template(sections),)


def test_lyrics_emotion_merger_parity():
    ref = _ref("VRGDG_LyricsEmotionMerger")
    rng = _rng(99)
    for _ in range(80):
        count = rng.randrange(0, 8)
        lyric_lines, emotion_lines = [], []
        for i in range(1, count + 1):
            if rng.random() < 0.9:
                lyric_lines.append(
                    f"lyricSegment{i} = {rng.choice(_WORDS)}")
            if rng.random() < 0.7:
                emotion_lines.append(
                    f"emotionSegment{i}={rng.choice(['sad', 'joy'])}")
            if rng.random() < 0.2:
                lyric_lines.append("# a comment line")
                emotion_lines.append("noise != segment")
        lyrics = "\n".join(lyric_lines)
        emotions = "\n".join(emotion_lines)
        assert ref.merge(lyrics, emotions)[0] == \
            ps.merge_lyrics_emotions(lyrics, emotions)


def test_emotion_sheet_roundtrip_and_humo_quantizer():
    """format_emotion_segments output merges with lyric sheets
    exactly as the reference emotion extractor's output does
    (HumoAutomationExtra2.py:786-792), and the 4N+1 quantizer matches
    the reference expression (:148-153)."""
    from vrgdg_tpu.runtime.audio_toolkit import adjust_frames_humo

    sheet = ps.format_emotion_segments(["sad", "joy", "calm"])
    assert sheet.splitlines()[0] == "# Emotion timeline (3 segments)"
    lyrics = "\n".join(f"lyricSegment{i}=line {i}" for i in (1, 2, 3))
    merged = ps.merge_lyrics_emotions(lyrics, sheet)
    assert 'lyricSegment2-emotion=joy "line 2"' in merged

    for frames in range(1, 260):
        expected = 4 * ((frames + 2) // 4) + 1
        assert adjust_frames_humo(frames) == expected
        assert adjust_frames_humo(frames) % 4 == 1


def test_pipe_or_paragraph_splitter_parity():
    ref = load_reference("HumoAutomation.py",
                         ["VRGDG_PromptSplitterV3"]
                         )["VRGDG_PromptSplitterV3"]()
    rng = _rng(111)
    samples = ["a | b|c ||  d", "one\n\ntwo\n\n\nthree", "single",
               "lines\nwithout\nblanks", "", "  |  ", "p1 | p2\n\np3"]
    for _ in range(60):
        sep = rng.choice([" | ", "\n\n", "\n"])
        samples.append(sep.join(
            rng.choices(_WORDS, k=rng.randrange(0, 20))))
    for text in samples:
        assert list(ref.split_prompt(text)) == \
            ps.split_pipe_or_paragraphs(text)


def test_theme_splitter_parity():
    ref = load_reference("HumoAutomation.py", ["VRGDG_ThemeSplitter"]
                         )["VRGDG_ThemeSplitter"]()
    rng = _rng(222)
    headers = ["Character Description", "song_theme_style",
               "ENVIRONMENT", "Lighting", "camera motion",
               "Physical Interaction", "facial expression", "Shots",
               "outfit rules", "Character Visibility", "Not A Header"]
    for _ in range(80):
        lines = []
        for _ in range(rng.randrange(0, 20)):
            if rng.random() < 0.3:
                lines.append(rng.choice(headers))
            elif rng.random() < 0.15:
                lines.append("")
            else:
                lines.append(" ".join(rng.choices(
                    _WORDS, k=rng.randrange(1, 5))))
        block = "\n".join(lines)
        theirs = ref.split_context(block)
        ours = ps.split_theme_context(block)
        assert tuple(ours[name] for name in ps.THEME_SECTIONS) == \
            theirs
