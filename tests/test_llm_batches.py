"""LLM batch pipeline: oracle-fuzz parity with HumoAutomationExtra1.py.

Each suite extracts the reference class via tests/reference_oracle.py
(AST surgery, no module top-level execution) and fuzzes the repo's
re-derivations in ``vrgdg_tpu.runtime.llm_batches`` against it:
JSON hygiene, the 16-slot splitter, the brace-scan extractor, the
batch combine renumbering, and the batcher's folder/resume/prompt
math.  Story-mode chapter threading is checked against structural
invariants of the reference's built instruction text (the prose itself
is first-party by policy — see api/instructions.py).
"""

import json
import os
import random

import pytest

from vrgdg_tpu.runtime import llm_batches as lb

from tests.reference_oracle import load_reference


class _FakePromptServer:
    class instance:  # noqa: N801 — mirrors the reference's attribute
        @staticmethod
        def send_sync(*_args, **_kwargs):
            return None


def _splitter():
    ref = load_reference("HumoAutomationExtra1.py",
                         ["VRGDG_PromptSplitterJson"])
    return ref["VRGDG_PromptSplitterJson"]()


def _saver():
    ref = load_reference("HumoAutomationExtra1.py",
                         ["VRGDG_LLM_OutputSaver"])
    return ref["VRGDG_LLM_OutputSaver"]()


def _batcher(output_root):
    class _FakeFolderPaths:
        @staticmethod
        def get_output_directory():
            return str(output_root)

    ref = load_reference(
        "HumoAutomationExtra1.py",
        ["VRGDG_LLM_PromptBatcher", "BATCH_FOLDER_PREFIX"],
        extra_globals={"folder_paths": _FakeFolderPaths,
                       "PromptServer": _FakePromptServer})
    return ref["VRGDG_LLM_PromptBatcher"]()


# ---------------------------------------------------------------------------
# fuzz input generators
# ---------------------------------------------------------------------------

_WORDS = ("dawn", "neon", "rain", "slow push-in", "wide shot",
          "ámbar", "雨", "hand-held", "—", "it's")


def _rng(seed):
    return random.Random(seed)


def _prompt_value(rng):
    roll = rng.random()
    if roll < 0.45:
        return " ".join(rng.choices(_WORDS, k=rng.randrange(1, 8)))
    if roll < 0.6:
        return {"shot": rng.choice(_WORDS), "n": rng.randrange(9),
                "skip": [1, 2] if rng.random() < 0.5 else None}
    if roll < 0.75:
        return [rng.choice(_WORDS), rng.randrange(100), None,
                rng.random()]
    if roll < 0.85:
        return rng.randrange(1000)
    if roll < 0.95:
        return round(rng.random() * 10, 3)
    return None


def _prompt_payload(rng, with_summary=True):
    count = rng.randrange(0, 20)
    data = {f"prompt{i + 1}": _prompt_value(rng) for i in range(count)}
    if with_summary and rng.random() < 0.7:
        data["summary"] = {
            "scene_summary": rng.choice(_WORDS),
            "character_arc": rng.choice(_WORDS),
            "narrative_thread": rng.choice(_WORDS),
            "next_scene_suggestion": rng.choice(_WORDS)}
    return data


def _damage(rng, text):
    """Apply the LLM-output damage classes the cleaner repairs."""
    if rng.random() < 0.5:
        text = f"```json\n{text}\n```"
    elif rng.random() < 0.3:
        text = f"```\n{text}```"
    if rng.random() < 0.4:
        text = text.replace('"prompt2":', "prompt2:", 1)
    if rng.random() < 0.3:
        text = text.replace('"prompt3":', '*prompt3":', 1)
    if rng.random() < 0.4:
        text = text.replace('"', "“", 1).replace('"', "”", 1)
    if rng.random() < 0.4:
        text = text.rstrip()[:-1] + ",}"
    if rng.random() < 0.3:
        text = text.replace(" ", "\t\x07 ", 1)
    if rng.random() < 0.2:
        text = "  " + text + "  "
    return text


# ---------------------------------------------------------------------------
# suites
# ---------------------------------------------------------------------------

def test_clean_prompt_json_parity():
    """clean_prompt_json ≡ _clean_json_text (ref :794-826) on damaged
    near-JSON, including inputs the cleaner cannot save."""
    ref = _splitter()
    rng = _rng(101)
    for case in range(250):
        payload = _prompt_payload(rng)
        text = json.dumps(payload, ensure_ascii=False,
                          indent=rng.choice([None, 1, 2]))
        text = _damage(rng, text)
        if case % 7 == 0:
            text = text[:rng.randrange(0, max(1, len(text)))]
        assert lb.clean_prompt_json(text) == ref._clean_json_text(text)


def test_split_prompt_parity(tmp_path):
    """split_prompt_json ≡ split_prompt (ref :828-919): 16 slots +
    summary + persisted prompt/summary JSON files."""
    ref = _splitter()
    rng = _rng(202)
    for case in range(120):
        payload = _prompt_payload(rng)
        text = _damage(rng, json.dumps(payload, ensure_ascii=False))
        ref_dir = tmp_path / f"ref{case}"
        our_dir = tmp_path / f"our{case}"
        ref_out = ref.split_prompt(text, file_path=str(ref_dir),
                                   index=case % 5)
        ours = lb.split_prompt_json(text, folder=str(our_dir),
                                    index=case % 5)
        if ours["ok"]:
            assert list(ref_out[:16]) == ours["prompts"]
            assert ref_out[16] == ours["summary"]
            for name in os.listdir(ref_dir):
                assert (ref_dir / name).read_text() == \
                    (our_dir / name).read_text(), name
        else:
            # reference floods all 17 outputs with one error string
            assert len(set(ref_out)) == 1
            assert len(set(ours["prompts"])) == 1
            assert not os.path.isdir(our_dir) or not os.listdir(our_dir)


def test_split_prompt_without_folder():
    out = lb.split_prompt_json('{"prompt1": "a", "summary": {"s": 1}}')
    assert out["ok"] and out["prompts"][0] == "a"
    assert out["prompts"][1:] == [""] * 15
    assert json.loads(out["summary"]) == {"s": 1}
    assert out["saved"] == []


def test_extract_json_block_parity():
    """extract_json_block ≡ _extract_json_text (ref :1439-1489),
    including the raise-on-no-JSON contract."""
    ref = _saver()
    rng = _rng(303)
    shells = ("Sure! Here you go:\n{body}\nHope that helps.",
              "```json\n{body}\n```",
              "```JSON  {body}   ```",
              "﻿noise ] {body}",
              "{body} trailing } noise",
              "{body}",
              "no json here at all",
              "closer } before opener only {")
    for case in range(160):
        payload = _prompt_payload(rng)
        body = json.dumps(payload if rng.random() < 0.7
                          else list(payload.values()),
                          ensure_ascii=False)
        text = rng.choice(shells).replace("{body}", body)
        try:
            expected = ref._extract_json_text(text)
            failed = None
        except ValueError as exc:
            expected, failed = None, exc
        if failed is not None:
            with pytest.raises(ValueError):
                lb.extract_json_block(text)
        else:
            assert lb.extract_json_block(text) == expected


def test_trailing_number_sort_parity():
    ref = _saver()
    keys = ["prompt10", "prompt2", "prompt1", "intro", "p03", "x",
            "prompt007", ""]
    assert sorted(keys, key=lb._trailing_number) == \
        sorted(keys, key=ref._numeric_prompt_sort_key)


def test_combine_batches_parity(tmp_path):
    """save_batch + combine_batches ≡ OutputSaver.run(final=True)
    (ref :1499-1595): same COMBINED.json bytes, same renumbering
    across fenced/chatty batch files."""
    ref = _saver()
    rng = _rng(404)
    for case in range(25):
        ref_dir = tmp_path / f"ref{case}"
        our_dir = tmp_path / f"our{case}"
        prefix = rng.choice(["Scene", "LLM_Output", "T2I"])
        batches = rng.randrange(1, 5)
        texts = []
        for index in range(batches):
            body = json.dumps(
                {f"prompt{rng.randrange(1, 30)}": rng.choice(_WORDS)
                 for _ in range(rng.randrange(1, 6))},
                ensure_ascii=False)
            texts.append(rng.choice(
                ["{body}", "```json\n{body}\n```",
                 "Here are the prompts:\n{body}\nDone!"]
            ).replace("{body}", body))
        for index, text in enumerate(texts[:-1]):
            (ref_dir / f"{prefix}_{index:03d}.txt").parent.mkdir(
                parents=True, exist_ok=True)
            (ref_dir / f"{prefix}_{index:03d}.txt").write_text(
                text, encoding="utf-8")
            lb.save_batch(str(our_dir), prefix, index, text)
        (combined_text,) = ref.run(
            texts[-1], batches - 1, True, str(ref_dir), prefix)
        lb.save_batch(str(our_dir), prefix, batches - 1, texts[-1])
        ours = lb.combine_batches(str(our_dir), prefix)
        assert ours["text"] == combined_text
        assert (our_dir / f"{prefix}_COMBINED.json").read_text() == \
            (ref_dir / f"{prefix}_COMBINED.json").read_text()
        assert ours["count"] == len(ours["combined"])


def test_plan_batch_parity(tmp_path):
    """plan_batch ≡ PromptBatcher.run (ref :1137-1390) across a full
    multi-run loop with resume-by-file-scan: same prompt text, batch
    index, totals, final flag, and run-folder naming."""
    rng = _rng(505)
    for case in range(12):
        ref_root = tmp_path / f"ref{case}"
        our_root = tmp_path / f"our{case}" / "llm_batches"
        batcher = _batcher(ref_root)
        total = rng.randrange(1, 23)
        batch_size = rng.randrange(5, 12)
        prefix = rng.choice(["Scene", "Shot"])
        groups = [{"group_index": i + 1,
                   "scene": rng.choice(_WORDS)} for i in range(total)]
        with_lyrics = rng.random() < 0.7
        lyrics = {f"seg{i + 1}": rng.choice(_WORDS)
                  for i in range(total)} if with_lyrics else None
        summary = " ".join(rng.choices(_WORDS, k=5))
        story_json = {"groups": groups} if rng.random() < 0.5 else groups

        done = False
        for step in range(6):
            ref_out = batcher.run(
                style_theme_block="", story_summary=summary,
                story_groups_json=story_json, batch_size=batch_size,
                output_subfolder="llm_batches", file_prefix=prefix,
                manual_index=-1, enable_auto_queue=False, trigger=None,
                lyric_segments_json=lyrics)
            ours = lb.plan_batch(
                str(our_root), story_json, summary,
                batch_size=batch_size, file_prefix=prefix,
                lyric_segments=lyrics)
            assert ours["prompt"] == ref_out[0]
            assert ours["batch_index"] == ref_out[1] == step
            assert ours["total_batches"] == ref_out[2]
            assert ours["is_final"] == ref_out[3]
            assert os.path.basename(ours["folder"]) == \
                os.path.basename(ref_out[4])
            reply = json.dumps({"prompt1": "x"})
            (ref_root / "llm_batches").mkdir(exist_ok=True)
            with open(os.path.join(ref_out[4],
                                   f"{prefix}_{step:03d}.txt"), "w",
                      encoding="utf-8") as handle:
                handle.write(reply)
            lb.save_batch(ours["folder"], prefix, step, reply)
            if ours["is_final"]:
                lb.combine_batches(ours["folder"], prefix)
                with open(os.path.join(
                        ref_out[4], f"{prefix}_COMBINED.json"), "w",
                        encoding="utf-8") as handle:
                    handle.write("{}")
                done = True
                break
        assert done

        # a finished folder must NOT be resumed: the next plan opens
        # Text2Image_Batch_002 (ref :1158-1164)
        follow = lb.plan_batch(str(our_root), story_json, summary,
                               batch_size=batch_size,
                               file_prefix=prefix,
                               lyric_segments=lyrics)
        assert follow["batch_index"] == 0 and not follow["resumed"]
        assert os.path.basename(follow["folder"]).endswith("002")


def test_plan_batch_manual_and_mismatch(tmp_path):
    groups = [{"g": i} for i in range(12)]
    with pytest.raises(ValueError):
        lb.plan_batch(str(tmp_path), groups, "s",
                      lyric_segments=[{"id": "a", "text": "b"}])
    manual = lb.plan_batch(str(tmp_path), groups, "s", batch_size=5,
                           manual_index=2)
    assert manual["batch_index"] == 2 and manual["manual"]
    assert manual["is_final"] and manual["batch_count"] == 2


def test_story_chapter_state_invariants(tmp_path):
    """Chapter threading vs the reference's built instruction text
    (ref :171-276): summary-block gating, final-chapter prompt count,
    previous-summary override, theme fallback."""
    ref = load_reference("HumoAutomationExtra1.py",
                         ["VRGDG_MusicVideoPromptCreatorJson"])
    creator = ref["VRGDG_MusicVideoPromptCreatorJson"]()

    def _ref_text(theme, folder, index, total, last):
        return creator.build_prompt_instructions(
            character_description="The Woman.",
            song_theme_style=theme,
            pipe_separated_lyrics="a | b",
            word_count_min=30, word_count_max=50,
            list_handling_mode="Reference Guide",
            prompt_structure_mode="Character-Focused",
            environment="field", lighting="dawn", camera_motion="pan",
            physical_interaction="walks", facial_expression="calm",
            shots="wide", outfit_rules="dress",
            character_visibility="visible", story_mode=True,
            signal=None, custom_instructions=None,
            Summary_File_Path=str(folder), summary_index=index,
            total_sets=total, groups_in_last_set=last)[0]

    rng = _rng(606)
    folder = tmp_path / "sums"
    folder.mkdir()
    for case in range(40):
        total = rng.randrange(1, 5)
        index = rng.randrange(0, total)
        last = rng.randrange(1, 17)
        theme = rng.choice(["mood piece", ""])
        prev = {"scene_summary": rng.choice(_WORDS),
                "character_arc": rng.choice(_WORDS),
                "narrative_thread": rng.choice(_WORDS),
                "next_scene_suggestion": rng.choice(_WORDS)}
        have_prev = index > 0 and rng.random() < 0.8
        prev_path = folder / f"summary{index - 1}.json"
        if have_prev:
            prev_path.write_text(json.dumps(prev))
        elif prev_path.exists():
            prev_path.unlink()

        text = _ref_text(theme, folder, index, total, last)
        state = lb.story_chapter_state(theme, str(folder), index,
                                       total, last)

        assert state["summary_loaded"] == have_prev
        assert (('"summary"' in text) ==
                state["wants_summary_block"])
        if state["is_final"]:
            assert f"exactly {state['prompts_this_run']} " in text
            assert state["prompts_this_run"] == last
        else:
            assert state["prompts_this_run"] == 16
        if have_prev:
            assert state["summary_data"] == prev
            for field in ("scene_summary", "character_arc",
                          "narrative_thread",
                          "next_scene_suggestion"):
                line = f"{field}: {prev[field]}"
                assert line in text and line in state["theme"]
        elif not theme:
            fallback = ("(derive a suitable cinematic theme and tone "
                        "based on the lyrical content)")
            assert fallback in text and fallback in state["theme"]


def test_story_chapter_unreadable_summary(tmp_path):
    (tmp_path / "summary0.json").write_text("{not json")
    state = lb.story_chapter_state("base", str(tmp_path), 1, 3, 16)
    assert not state["summary_loaded"]
    assert "base" in state["theme"]
    assert "failed to read summary file" in state["theme"]
