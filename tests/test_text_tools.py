"""Prompt chunking / run-index state vs the reference contracts.

Reference: /root/reference/nodes.py:1381-1560 (chunkers, index stepper),
GeneralVideoNodes.py:2848-2915 (prompt splitter),
GeneralVideoNodes2.py:1082-1136 (run-state logger).
"""

import json

import pytest

from vrgdg_tpu.runtime import text_tools as tt


class TestChunkPipePrompts:
    def test_basic_window(self):
        text = " | ".join(f"p{i}" for i in range(20))
        out = tt.chunk_pipe_prompts(text, scene_count=4, index=0,
                                    total_sets=2)
        assert out == ["p0", "p1", "p2", "p3"]

    def test_stride_is_fixed_sixteen(self):
        # The reference advances by 16 per index regardless of
        # scene_count (nodes.py:1417) — workflow parity quirk.
        text = " | ".join(f"p{i}" for i in range(40))
        out = tt.chunk_pipe_prompts(text, scene_count=4, index=1,
                                    total_sets=3)
        assert out == ["p16", "p17", "p18", "p19"]

    def test_padding_and_exhausted_sets(self):
        out = tt.chunk_pipe_prompts("a|b", scene_count=4, index=0,
                                    total_sets=1)
        assert out == ["a", "b", "", ""]
        assert tt.chunk_pipe_prompts("a|b", 3, index=5,
                                     total_sets=2) == ["", "", ""]


class TestChunkQuotedPrompts:
    def test_extracts_quoted_and_strides_by_scene_count(self):
        text = " ".join(f'prompt {i}: "text {i}" |' for i in range(8))
        assert tt.chunk_quoted_prompts(text, 3, 0) == [
            "text 0", "text 1", "text 2"]
        assert tt.chunk_quoted_prompts(text, 3, 1) == [
            "text 3", "text 4", "text 5"]

    def test_shortfall_raises(self):
        with pytest.raises(ValueError):
            tt.chunk_quoted_prompts('"only one"', scene_count=3, index=0)


class TestSelectPrompt:
    def test_list_wraps_and_stringifies(self):
        assert tt.select_prompt('["a", "b"]', 3) == ("b", "0")

    def test_dict_digit_key_order(self):
        src = json.dumps({"scene10": "ten", "scene2": "two",
                          "scene1": "one"})
        assert tt.select_prompt(src, 1) == ("two", "0")
        assert tt.select_prompt(src, 2) == ("ten", "0")

    def test_new_format_image_index(self):
        src = json.dumps([{"text": "hello", "imageIndex": [3, 5]}])
        assert tt.select_prompt(src, 0) == ("hello", "3,5")
        src = json.dumps([{"text": "x", "imageIndex": None}])
        assert tt.select_prompt(src, 0) == ("x", "0")

    def test_malformed_degrades(self):
        assert tt.select_prompt("{not json", 0) == ("", "0")
        assert tt.select_prompt("[]", 0) == ("", "0")


class TestRunIndexState:
    def test_step_and_read(self, tmp_path):
        path = str(tmp_path / "state.json")
        assert tt.read_run_index(path) == 0
        assert tt.step_run_index(path) == (0, 1)
        assert tt.step_run_index(path) == (1, 2)
        assert tt.read_run_index(path) == 2
        # no-increment holds the value; reset zeroes both
        assert tt.step_run_index(path, increment=False) == (2, 2)
        assert tt.step_run_index(path, reset=True) == (0, 0)
        assert tt.read_run_index(path) == 0

    def test_corrupt_state_recovers(self, tmp_path):
        path = tmp_path / "state.json"
        path.write_text("{broken")
        assert tt.read_run_index(str(path)) == 0
        assert tt.step_run_index(str(path)) == (0, 1)


def test_log_run_state(tmp_path):
    log = tt.log_run_state(str(tmp_path), index=2, total_sets=5,
                           trigger={"files": ["a.mp4"]}, note="n",
                           timestamp="2026-01-01 00:00:00")
    assert log.endswith("vrgdg_temp/srt_run_state.jsonl")
    tt.log_run_state(str(tmp_path), index=3, total_sets=5,
                     trigger=object())  # non-serializable -> repr
    lines = [json.loads(line) for line in
             open(log, encoding="utf-8").read().splitlines()]
    assert lines[0]["index"] == 2 and lines[0]["note"] == "n"
    assert lines[0]["timestamp"] == "2026-01-01 00:00:00"
    assert isinstance(lines[1]["trigger"], str)  # repr fallback


class TestStoryboardBookkeeping:
    """Numbered-output-folder tracking
    (GeneralVideoNodes2.py:1250-1378)."""

    def test_next_output_index(self, tmp_path):
        assert tt.next_output_index(str(tmp_path / "nope")) == 1
        assert tt.next_output_index(str(tmp_path)) == 1
        for name in ("0003_scene.png", "0010_scene.png", "notes.txt",
                     "07.png"):
            (tmp_path / name).write_bytes(b"x")
        assert tt.next_output_index(str(tmp_path)) == 11

    def test_parse_redo_indexes(self):
        assert tt.parse_redo_indexes("3, 1 5,3\n2") == [3, 1, 5, 2]
        assert tt.parse_redo_indexes("0, -4, x") == []
        assert tt.parse_redo_indexes("") == []

    def test_parse_override_blocks(self):
        text = "first prompt\nstill first\n\n\nsecond\n\n   \nthird"
        assert tt.parse_override_blocks(text) == [
            "first prompt\nstill first", "second", "third"]
        assert tt.parse_override_blocks("") == []

    def test_backup_numbered_files(self, tmp_path):
        (tmp_path / "0002_a.png").write_bytes(b"a")
        (tmp_path / "0002_b.png").write_bytes(b"b")
        (tmp_path / "0003_c.png").write_bytes(b"c")
        moved = tt.backup_numbered_files(str(tmp_path), 2)
        assert [p.split("/")[-1] for p in moved] == [
            "0002_a_old.png", "0002_b_old.png"]
        assert (tmp_path / "0003_c.png").exists()
        # collision: second backup of the same index gets a timestamp
        (tmp_path / "0002_a.png").write_bytes(b"a2")
        moved = tt.backup_numbered_files(str(tmp_path), 2,
                                         timestamp="20260101_000000")
        assert moved[0].endswith("0002_a_old_20260101_000000.png")


def test_extract_prompt_text_sanitizer():
    """LLM prompt-output sanitizer
    (VRGDG_GemmaPromptSanitizer.py:91-105)."""
    from vrgdg_tpu.runtime.text_tools import extract_prompt_text

    # fenced JSON with role/thought prefix stripped, scene targeting
    raw = ('model\nThought: pick scene 2.\n```json\n'
           '{"scenes": [{"scene_number": 1, "prompt": "a red door"},'
           '{"scene_number": 2, "image_prompt": "a blue door"}]}\n```')
    assert extract_prompt_text(raw, 2) == "a blue door"
    assert extract_prompt_text(raw, "scene 1") == "a red door"
    # no scene match -> first prompt value anywhere
    assert extract_prompt_text(raw, 9) == "a red door"
    # bare list of items
    assert extract_prompt_text(
        '[{"t2i_prompt": "wide shot"}]') == "wide shot"
    # prose around JSON: the bracket slice parses
    assert extract_prompt_text(
        'Sure! {"prompt": "dawn sky"} enjoy') == "dawn sky"
    # key priority: image_prompt beats prompt
    assert extract_prompt_text(
        '{"prompt": "b", "image_prompt": "a"}') == "a"
    # non-JSON text falls back to the cleaned text
    assert extract_prompt_text("```\njust a plain prompt\n```") == \
        "just a plain prompt"
    assert extract_prompt_text("") == ""


def test_concept_prompt_items_parity(tmp_path):
    """Oracle-fuzz parse_concept_prompt_items / strip_llm_fence /
    first_clean_llm_line vs the reference Gemma-flow helpers
    (VRGDG_GeneralNodes2.py:576-682)."""
    from tests.reference_oracle import load_reference
    from vrgdg_tpu.api import text_files as tfl
    from vrgdg_tpu.runtime.text_tools import (first_clean_llm_line,
                                              parse_concept_prompt_items,
                                              strip_llm_fence)

    root = str(tmp_path)

    class _FakeFolderPaths:
        @staticmethod
        def get_output_directory():
            return root

    ref = load_reference(
        "VRGDG_GeneralNodes2.py",
        ["_strip_json_fence", "_clean_gemma4_text",
         "_first_clean_gemma4_line", "_parse_concept_prompt_items",
         "_get_vrgdg_text_file_path", "_get_t2i_prompts_output_path",
         "_get_t2v_prompts_output_path"],
        extra_globals={"folder_paths": _FakeFolderPaths})

    texts = [
        "", None, "   ", "```json\n{\"a\": \"x\"}\n```",
        "```JSON\n[\"one\", \"two\"]\n```", "```\nplain\n```",
        "{\"p2\": \"beta\", \"p1\": \"alpha\", \"empty\": \"  \"}",
        "[\"a\", {\"x\": 1}, \"\"]", "[[\"k1\", \"v1\"], [\"k2\", 2]]",
        "[[\"k1\", \"v1\"], [\"k2\", 2], [\"odd\"]]",
        "{\"outer\": {\"inner\": \"v\"}}", "5", "null",
        "block one\nsecond line\n\nblock two", "not { json",
        "\n\n\n", "- first bullet\n- second",
        "1. numbered line\nplain", "* starred\n\n2) numbered",
        "```text\n  the line  \nnext\n```",
    ]
    for text in texts:
        assert strip_llm_fence(text, tag="json") == \
            ref["_strip_json_fence"](text), text
        assert strip_llm_fence(text, tag="text") == \
            ref["_clean_gemma4_text"](text), text
        assert first_clean_llm_line(text) == \
            ref["_first_clean_gemma4_line"](text), text
        mine = theirs = my_exc = their_exc = None
        try:
            mine = parse_concept_prompt_items(text)
        except ValueError as exc:
            my_exc = str(exc)
        try:
            theirs = ref["_parse_concept_prompt_items"](text)
        except ValueError as exc:
            their_exc = str(exc)
        assert my_exc == their_exc, text
        if mine is not None:
            assert [list(pair) for pair in mine] == \
                [list(pair) for pair in theirs], text

    for folder, name in (("t2iNotes", "t2iNotes.txt"),
                         ("storyconcept", "storyconcept.txt"),
                         ("weird name?", "x.txt")):
        assert tfl.vrgdg_text_file_path(folder, name, root) == \
            ref["_get_vrgdg_text_file_path"](
                tfl.sanitize_segment(folder), name)
    assert tfl.vrgdg_text_file_path("t2i_Prompts", "t2i_Prompts.txt",
                                    root) == \
        ref["_get_t2i_prompts_output_path"]()
    assert tfl.vrgdg_text_file_path("t2v_Prompts", "t2v_Prompts.txt",
                                    root) == \
        ref["_get_t2v_prompts_output_path"]()
