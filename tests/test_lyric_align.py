"""Timestamped-lyrics alignment: oracle-fuzz vs HumoAutomationExtra2.

Extracts ``VRGDG_TimestampedLyricsExtractor`` (+ its parent) via AST
surgery and fuzzes ``runtime/lyric_align.py`` against the reference's
deterministic internals on synthetic songs: reference-unit parsing,
cursor alignment, acoustic word alignment, the full scene assembly
across every segment mode, gap insertion, and the end-to-end payload.
The ASR model invocation itself is out of scope; inputs follow the
MIGRATION.md external audio-ML contract.
"""

import copy
import difflib
import json
import random

from vrgdg_tpu.runtime import lyric_align as la

from tests.reference_oracle import load_reference

_VOCAB = ("love", "night", "fire", "run", "away", "don't", "hold",
          "me", "down", "light", "rain", "gold", "echo", "stay",
          "follow", "river", "home", "breathe", "slow", "wild")


def _extractor():
    ref = load_reference(
        "HumoAutomationExtra2.py",
        ["VRGDG_ManualLyricsExtractor_SRT_Advanced",
         "VRGDG_TimestampedLyricsExtractor"],
        extra_globals={"difflib": difflib})
    return ref["VRGDG_TimestampedLyricsExtractor"]()


def _rng(seed):
    return random.Random(seed)


def _song(rng, lines=None):
    """Synthetic reference lyrics + a word timeline derived from them
    with ASR-style damage (drops, misspellings, splits, jitter)."""
    if lines is None:
        lines = rng.randrange(2, 8)
    reference_lines = []
    for _ in range(lines):
        count = rng.randrange(2, 8)
        reference_lines.append(" ".join(rng.choices(_VOCAB, k=count)))

    text_lines = []
    for line in reference_lines:
        text_lines.append(line)
        if rng.random() < 0.2:
            text_lines.append("")
        if rng.random() < 0.15:
            text_lines.append(rng.choice(
                ["[Chorus]", "[instrumental]", "[Instrumental break]",
                 "[Verse 2]"]))
    reference_text = "\n".join(text_lines)

    clock = rng.uniform(0.0, 3.0)
    words = []
    for line in reference_lines:
        for token in line.split():
            if rng.random() < 0.12:      # ASR dropped the word
                clock += rng.uniform(0.2, 0.6)
                continue
            spoken = token
            if rng.random() < 0.1:       # misspelling
                spoken = token[:-1] + rng.choice("aeioux") \
                    if len(token) > 2 else token + "h"
            start = clock
            duration = rng.uniform(0.15, 0.6)
            clock += duration
            words.append({"start": round(start, 3),
                          "end": round(clock, 3), "text": spoken})
            clock += rng.uniform(0.02, 0.4)
        clock += rng.uniform(0.0, 4.0)   # inter-line silence

    segments = []
    cursor = 0
    while cursor < len(words):
        take = rng.randrange(2, 7)
        chunk = words[cursor:cursor + take]
        segments.append({
            "type": "vocal",
            "start": chunk[0]["start"], "end": chunk[-1]["end"],
            "duration": round(chunk[-1]["end"] - chunk[0]["start"], 3),
            "text": " ".join(w["text"] for w in chunk),
            "words": chunk})
        cursor += take
    total = clock + rng.uniform(0.0, 6.0)
    return reference_text, segments, round(total, 3)


def test_clean_and_normalize_parity():
    ref = _extractor()
    samples = ["Heeeeey--yeah,,  now", "don't_stop—me", "ámbar 雨!!!",
               "", "aaaa bbbbbb c", "Hold, my _ hand —now"]
    for text in samples:
        assert la.clean_lyric(text) == ref._clean_lyric(text)
        assert la.normalize_for_match(text) == \
            ref._normalize_for_match(text)
    assert la.split_reference_lyrics(
        "Lyrics\n[Verse]\nhold me now\n\nFULL LYRICS\nrun away") == \
        ref._split_reference_lyrics(
        "Lyrics\n[Verse]\nhold me now\n\nFULL LYRICS\nrun away")


def test_reference_units_parity():
    ref = _extractor()
    rng = _rng(7)
    modes = ("reference_lines", "exact_reference_lines",
             "reference_stanzas", "reference_scene_words")
    for case in range(120):
        text, _, _ = _song(rng)
        mode = rng.choice(modes)
        marker = rng.choice(["[instrumental]", "(break)"])
        assert la.reference_units(text, mode, marker) == \
            ref._reference_units(text, mode, marker)


def test_word_items_and_align_unit_parity():
    ref = _extractor()
    rng = _rng(17)
    for _ in range(80):
        text, segments, _ = _song(rng)
        ours = la.word_items_from_segments(segments)
        theirs = ref._word_items_from_segments(segments)
        assert ours == theirs
        cursor = 0
        for line in la.split_reference_lyrics(text):
            seg_ref, cur_ref = ref._align_reference_unit(
                line, theirs, cursor)
            seg_our, cur_our = la.align_unit(line, ours, cursor)
            assert seg_our == seg_ref
            assert cur_our == cur_ref
            cursor = cur_our


def test_acoustic_reference_alignment_parity():
    ref = _extractor()
    rng = _rng(27)
    for _ in range(60):
        text, segments, total = _song(rng)
        units = la.reference_units(text, "reference_scene_words",
                                   "[instrumental]")
        ours = la.acoustic_reference_alignment(
            units, copy.deepcopy(segments), total)
        theirs = ref._reference_scene_word_segments(
            units, copy.deepcopy(segments), total)
        assert ours == theirs


def test_scene_assembly_parity_all_modes():
    """The full assembler vs _segments_from_reference_units across
    every segment mode and parameter mix — the load-bearing suite."""
    ref = _extractor()
    rng = _rng(37)
    modes = ("reference_lines", "exact_reference_lines",
             "reference_stanzas", "reference_scene_words")
    for case in range(90):
        text, segments, total = _song(rng)
        mode = modes[case % len(modes)]
        include_gaps = rng.random() < 0.75
        min_gap = rng.choice([0.5, 1.0, 2.0])
        min_scene = rng.choice([0.5, 1.0, 2.0])
        max_scene = rng.choice([4.0, 8.0, 3.0])
        tail = rng.choice([0.0, 0.6, 1.2])
        units = la.reference_units(text, mode, "[instrumental]")

        prealigned = None
        if mode == "reference_scene_words":
            prealigned = la.acoustic_reference_alignment(
                units, copy.deepcopy(segments), total)

        assembler = la.SceneAssembler(
            total_duration=total, instrumental_text="[instrumental]",
            min_gap_seconds=min_gap, min_scene_seconds=min_scene,
            max_scene_seconds=max_scene,
            vocal_tail_padding_seconds=tail,
            include_instrumental_gaps=include_gaps,
            exact_reference_lines=(mode == "exact_reference_lines"),
            preserve_reference_units=True)
        ours = assembler.assemble(units, copy.deepcopy(segments),
                                  copy.deepcopy(prealigned))
        theirs = ref._segments_from_reference_units(
            copy.deepcopy(units), copy.deepcopy(segments), total,
            "[instrumental]", min_gap, include_gaps, min_scene,
            max_scene, tail,
            exact_reference_lines=(mode == "exact_reference_lines"),
            preserve_reference_units=True,
            prealigned_reference_segments=copy.deepcopy(prealigned))
        assert ours == theirs, f"case {case} mode {mode}"


def test_scene_assembly_without_unit_preservation():
    """preserve_reference_units=False exercises the word-gap vocal
    splitter (reference :2702-2799)."""
    ref = _extractor()
    rng = _rng(47)
    for case in range(60):
        text, segments, total = _song(rng)
        units = la.reference_units(text, "reference_lines",
                                   "[instrumental]")
        min_gap = rng.choice([0.3, 0.8, 1.5])
        max_scene = rng.choice([2.0, 4.0, 6.0])
        assembler = la.SceneAssembler(
            total_duration=total, min_gap_seconds=min_gap,
            min_scene_seconds=0.5, max_scene_seconds=max_scene,
            vocal_tail_padding_seconds=0.4,
            include_instrumental_gaps=True)
        ours = assembler.assemble(units, copy.deepcopy(segments))
        theirs = ref._segments_from_reference_units(
            copy.deepcopy(units), copy.deepcopy(segments), total,
            "[instrumental]", min_gap, True, 0.5, max_scene, 0.4)
        assert ours == theirs, f"case {case}"


def test_with_instrumental_gaps_parity():
    ref = _extractor()
    rng = _rng(57)
    for _ in range(60):
        _, segments, total = _song(rng)
        min_gap = rng.choice([0.5, 1.0, 3.0])
        max_scene = rng.choice([3.0, 8.0])
        ours = la.with_instrumental_gaps(
            copy.deepcopy(segments), total, "[instrumental]",
            min_gap, 1.0, max_scene)
        theirs = ref._with_instrumental_gaps(
            copy.deepcopy(segments), total, "[instrumental]",
            min_gap, 1.0, max_scene)
        assert ours == theirs


def test_timestamped_payload_end_to_end():
    """The full payload builder vs a reference-internals driver that
    mirrors extract_timestamped_lyrics minus the ASR call
    (reference :3045-3138)."""
    ref = _extractor()
    rng = _rng(67)
    modes = ("whisper_chunks", "reference_lines",
             "exact_reference_lines", "reference_stanzas",
             "reference_scene_words")
    for case in range(40):
        text, segments, total = _song(rng)
        mode = modes[case % len(modes)]
        include_gaps = rng.random() < 0.8

        payload = la.timestamped_lyrics(
            copy.deepcopy(segments), total, reference_lyrics=text,
            segment_mode=mode,
            include_instrumental_gaps=include_gaps,
            min_gap_seconds=1.0, min_scene_seconds=1.0,
            max_scene_seconds=8.0, vocal_tail_padding_seconds=0.6,
            mode="external", model_name="large-v3",
            language="english")

        units = ref._reference_units(text, mode, "[instrumental]") \
            if mode != "whisper_chunks" else []
        if units:
            prealigned = ref._reference_scene_word_segments(
                units, copy.deepcopy(segments), total) \
                if mode == "reference_scene_words" else None
            expected = ref._segments_from_reference_units(
                units, copy.deepcopy(segments), total,
                "[instrumental]", 1.0, include_gaps, 1.0, 8.0, 0.6,
                exact_reference_lines=(
                    mode == "exact_reference_lines"),
                preserve_reference_units=mode in {
                    "reference_lines", "exact_reference_lines",
                    "reference_stanzas", "reference_scene_words"},
                prealigned_reference_segments=prealigned)
        else:
            expected = copy.deepcopy(segments)
            if include_gaps:
                expected = ref._with_instrumental_gaps(
                    expected, total, "[instrumental]", 1.0, 1.0, 8.0)
        for position, segment in enumerate(expected, 1):
            segment["index"] = position

        assert payload["segments"] == expected, f"case {case} {mode}"
        assert payload["segment_count"] == len(expected)
        assert payload["duration"] == round(total, 3)
        assert payload["version"] == 1
        json.dumps(payload)  # payload must be JSON-serializable


def test_segments_from_words_contract():
    """The external-contract adapter mirrors
    _segments_from_stable_result semantics on plain dicts."""
    raw = [
        {"text": " hold me ", "start": 1.0, "end": 2.0,
         "words": [{"word": " hold ", "start": 1.0, "end": 1.4},
                   {"word": "me", "start": 1.5, "end": 2.0}]},
        {"text": "", "start": 3.0, "end": 4.0,
         "words": [{"word": "run", "start": 3.1, "end": 3.5}]},
        {"text": "", "words": []},                 # dropped: no text
        {"text": "tail", "start": 9.0, "end": 8.0,  # end clamped
         "words": []},
    ]
    segments = la.segments_from_words(raw)
    assert [seg["text"] for seg in segments] == ["hold me", "run",
                                                 "tail"]
    assert segments[0]["words"][0] == {"start": 1.0, "end": 1.4,
                                       "text": "hold"}
    assert segments[1]["text"] == "run"      # rebuilt from words
    assert segments[2]["end"] == segments[2]["start"] == 9.0


# ---------------------------------------------------------------------------
# SRT-window lyric extraction family (reference :1462-2119)
# ---------------------------------------------------------------------------

def _v9():
    ref = load_reference(
        "HumoAutomationExtra2.py",
        ["VRGDG_ManualLyricsExtractor_SRT_Advanced",
         "VRGDG_ManualLyricsExtractor_SRT_Advanced_BeatV9"],
        extra_globals={"difflib": difflib})
    return ref["VRGDG_ManualLyricsExtractor_SRT_Advanced_BeatV9"]()


def _window_texts(rng, reference_lines, count=None):
    """ASR window texts: reference lines with damage, filler windows,
    hallucinations, empties."""
    texts = []
    pool = list(reference_lines)
    while pool or (count and len(texts) < count):
        roll = rng.random()
        if roll < 0.5 and pool:
            line = pool.pop(0)
            tokens = line.split()
            kept = [t for t in tokens if rng.random() > 0.15]
            texts.append(" ".join(kept) if kept else line)
        elif roll < 0.65:
            texts.append(rng.choice(["", "  ", "oh ooh", "la la la",
                                     "yeah yeah", "mmm hmm"]))
        elif roll < 0.8:
            texts.append(" ".join(rng.choices(
                ("static", "hiss", "crowd", "noise xyzzy"), k=2)))
        elif pool:
            # two lines heard in one window
            first = pool.pop(0)
            second = pool[0] if pool else ""
            texts.append(f"{first} {second}".strip())
        else:
            break
        if count and len(texts) >= count:
            break
    return texts


def test_window_helper_parity():
    ref = _extractor()
    rng = _rng(87)
    for _ in range(120):
        text = " ".join(rng.choices(
            _VOCAB + ("ohhh", "laaa", "[Chorus]", "Lyrics", "it's",
                      "FULL LYRICS", "12"), k=rng.randrange(0, 9)))
        assert la.clean_aligned_lyric_text(text) == \
            ref._clean_aligned_lyric_text(text)
        assert la.content_tokens(text) == ref._content_tokens(text)
        for min_words in (1, 2, 3):
            assert la.is_alignment_meaningful(text, min_words) == \
                ref._is_alignment_meaningful_text(text, min_words)
        for level in (1, 2, 3):
            assert la.is_meaningful_text(text, level) == \
                ref._is_meaningful_text(text, level)
        prev = " ".join(rng.choices(_VOCAB, k=rng.randrange(0, 4)))
        cur = " ".join(rng.choices(_VOCAB, k=rng.randrange(0, 4)))
        assert la.strip_repeated_boundary_word(prev, cur) == \
            ref._strip_repeated_boundary_word(prev, cur)


def test_window_chunks_and_windows_parity(tmp_path):
    ref = _extractor()
    rng = _rng(97)
    for _ in range(40):
        _, segments, _ = _song(rng)
        # dict-contract chunks vs reference's object walk via shims
        import types
        shim_segments = []
        for seg in segments:
            words = [types.SimpleNamespace(word=w["text"],
                                           start=w["start"],
                                           end=w["end"])
                     for w in seg["words"]]
            shim_segments.append(types.SimpleNamespace(
                text=seg["text"], start=seg["start"],
                end=seg["end"], words=words))
        result = types.SimpleNamespace(segments=shim_segments)
        theirs = ref._collect_time_text_chunks(result)
        ours = la.collect_time_text_chunks(segments)
        assert ours == theirs
        start = rng.uniform(0, 10)
        end = start + rng.uniform(0.5, 8)
        assert la.text_for_window(ours, start, end) == \
            ref._text_for_window(theirs, start, end)

    # fixed windows: frame-quantized sample math
    for sr, fps, dur, total in ((44100, 25, 4.0, 44100 * 19),
                                (22050, 24, 2.5, 22050 * 7 + 13),
                                (16000, 30, 8.0, 16000 * 61)):
        frames_per_scene = int(round(fps * dur))
        samples_per_scene = int(frames_per_scene * sr / fps + 0.5)
        import math as m
        expected = []
        for i in range(m.ceil(total / samples_per_scene)):
            expected.append((
                (i * samples_per_scene) / sr,
                min((i + 1) * samples_per_scene, total) / sr))
        assert la.fixed_scene_windows(total, sr, fps, dur) == expected

    # srt windows vs the reference's file parser
    srt = ("1\n00:00:01,500 --> 00:00:04,000\nhello\n\n"
           "2\n00:01:00,250 --> 00:01:02,750\nworld\n")
    path = tmp_path / "w.srt"
    path.write_text(srt)
    assert la.srt_windows(srt) == ref._parse_srt_segments(str(path))


def test_cleanup_and_merge_parity():
    ref = _extractor()
    rng = _rng(107)
    for _ in range(80):
        lines = [" ".join(rng.choices(_VOCAB, k=rng.randrange(2, 6)))
                 for _ in range(rng.randrange(1, 6))]
        windows = _window_texts(rng, lines, count=rng.randrange(1, 10))
        assert la.cleanup_reference_segments(windows, lines) == \
            ref._cleanup_reference_segments(windows, lines)
        backup = _window_texts(rng, lines,
                               count=rng.randrange(1, 10))
        for level in (1, 2, 3):
            ours = la.merge_missing_segments(windows, backup, level)
            theirs = ref._merge_missing_segments(windows, backup,
                                                 level)
            assert ours == theirs


def test_align_windows_parity_strict_and_loose():
    """The DP strict alignment and the loose cursor walk, plus the V9
    legacy variant, against both reference classes."""
    ref = _extractor()
    v9 = _v9()
    rng = _rng(117)
    for case in range(80):
        lines = [" ".join(rng.choices(_VOCAB, k=rng.randrange(2, 7)))
                 for _ in range(rng.randrange(1, 8))]
        windows = _window_texts(rng, lines,
                                count=rng.randrange(1, 12))
        preserve = rng.random() < 0.8
        min_words = rng.choice([1, 2, 3])
        for strict in (True, False):
            ours = la.align_windows_to_reference(
                windows, lines, strict_reference_text=strict,
                preserve_nonvocal_segments=preserve,
                alignment_min_words=min_words)
            theirs = ref._align_segments_to_reference(
                windows, lines, strict_reference_text=strict,
                preserve_nonvocal_segments=preserve,
                alignment_min_words=min_words)
            assert ours == theirs, f"case {case} strict={strict}"
            ours_v9 = la.align_windows_to_reference(
                windows, lines, strict_reference_text=strict,
                preserve_nonvocal_segments=preserve,
                alignment_min_words=min_words, legacy_beat=True)
            theirs_v9 = v9._align_segments_to_reference(
                windows, lines, strict_reference_text=strict,
                preserve_nonvocal_segments=preserve,
                alignment_min_words=min_words)
            assert ours_v9 == theirs_v9, f"case {case} v9 {strict}"
        # empty reference passthrough
        assert la.align_windows_to_reference(windows, []) == windows


def test_extract_window_lyrics_flows():
    """The composed decision tree mirrors the reference's extract
    flow on contract inputs (reference :1903-2042)."""
    ref = _extractor()
    rng = _rng(127)
    for case in range(30):
        text, segments, total = _song(rng)
        lines = la.split_reference_lyrics(text)
        windows = la.fixed_scene_windows(
            int(total * 16000), 16000, 25, 4.0)

        # path 1: no reference — raw windows
        out = la.extract_window_lyrics(segments, windows)
        ref_chunks = la.collect_time_text_chunks(segments)
        expected = [la.text_for_window(ref_chunks, s, e)
                    for s, e in windows]
        assert out["texts"] == expected
        assert out["sheet"].startswith(
            f"# Lyrics to fix: ({len(windows)} segments)")

        # path 2: transcription + fuzzy mapping
        out = la.extract_window_lyrics(
            segments, windows, reference_lyrics=text,
            native_align=False, strict_reference_text=True)
        window_texts = [la.clean_aligned_lyric_text(
            la.text_for_window(ref_chunks, s, e))
            for s, e in windows]
        expected = ref._align_segments_to_reference(
            window_texts, lines, strict_reference_text=True,
            preserve_nonvocal_segments=True, alignment_min_words=2)
        assert out["texts"] == expected

        # path 3: native align + cleanup + strict reassignment from
        # backup windows
        out = la.extract_window_lyrics(
            segments, windows, reference_lyrics=text,
            backup_segments=segments, native_align=True,
            strict_reference_text=True)
        expected = ref._align_segments_to_reference(
            window_texts, lines, strict_reference_text=True,
            preserve_nonvocal_segments=True, alignment_min_words=2)
        assert out["texts"] == expected
        for line in out["sheet"].splitlines()[2:]:
            assert line.startswith("lyricSegment")


def test_humo_scene_windows_match_reference_math():
    """Window boundaries equal the plain Manual Lyrics Extractor's
    4N+1-quantized sample math (HumoAutomationExtra2.py:222-236)."""
    import math as m

    from vrgdg_tpu.runtime.audio_toolkit import adjust_frames_humo

    for rate, dur, total in ((44100, 4.0, 44100 * 31),
                             (48000, 2.5, 48000 * 9 + 7)):
        frames = adjust_frames_humo(int(round(25 * dur)))
        sps = int(frames * rate / 25 + 0.5)
        expected = [((i * sps) / rate, min((i + 1) * sps, total) / rate)
                    for i in range(m.ceil(total / sps))]
        assert la.humo_scene_windows(total, rate, dur) == expected


def test_srt_windows_robust_inputs():
    """Index-less and malformed SRT blocks must parse or skip, never
    raise — the port accepts arbitrary user text over HTTP/CLI."""
    indexless = ("00:00:00,000 --> 00:00:06,000\nhello\n\n"
                 "00:00:06,000 --> 00:00:12,000\nworld")
    assert la.srt_windows(indexless) == [(0.0, 6.0), (6.0, 12.0)]
    messy = ("garbage block\n\n"
             "3\nnot a timestamp\nstill not\n\n"
             "4\n00:00:01,500 --> 00:00:02,000\nok\n\n"
             "5\n00:bad:00,000 --> 00:00:09,000\nskipped")
    assert la.srt_windows(messy) == [(1.5, 2.0)]
    assert la.srt_windows("") == []
