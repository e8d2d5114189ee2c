"""Oracle fuzz: graph-glue plans vs the reference node families.

The reference's multi-LoRA loaders and mute/group switchers interleave
their decision tables with ComfyUI side effects
(``VRGDG_GeneralNodes2.py:1801-2096`` / ``:2168-2357``).  Here the
reference classes run with recording fakes (``comfy.sd`` /
``PromptServer``) and the captured call sequences are compared against
``runtime.graph_plans``' pure plans — the same inject-and-capture
technique as tests/test_llm_batches.py.
"""

import random
import time

import pytest

from tests.reference_oracle import load_reference
from vrgdg_tpu.runtime import graph_plans


# ---------------------------------------------------------------------------
# fakes
# ---------------------------------------------------------------------------

class _Recorder:
    def __init__(self):
        self.calls = []


def _fake_comfy(recorder):
    class _Utils:
        @staticmethod
        def load_torch_file(path, safe_load=True):
            return {"path": path}

    class _Sd:
        @staticmethod
        def load_lora_for_models(model, clip, lora, strength, strength_clip):
            recorder.calls.append((lora["path"], strength))
            return ({"patched": model, "with": lora["path"]}, clip)

    class _Comfy:
        utils = _Utils
        sd = _Sd

    return _Comfy


class _FakeFolderPaths:
    @staticmethod
    def get_filename_list(category):
        return ["a.safetensors", "b.safetensors"]

    @staticmethod
    def get_full_path_or_raise(category, name):
        return f"/fake/{category}/{name}"


def _fake_prompt_server(recorder):
    class _PromptServer:
        class instance:  # noqa: N801 — mirrors the reference attribute
            @staticmethod
            def send_sync(event, payload=None):
                recorder.calls.append((event, payload))

    return _PromptServer


def _lora_oracle(class_name):
    recorder = _Recorder()
    names = [class_name]
    if class_name == "VRGDG_OptionalMultiLoraTwoPassStrengths":
        names.insert(0, "VRGDG_OptionalMultiLoraModelOnly")  # base class
    ref = load_reference(
        "VRGDG_GeneralNodes2.py", names,
        extra_globals={"comfy": _fake_comfy(recorder),
                       "folder_paths": _FakeFolderPaths})
    return ref[class_name](), recorder


def _switch_oracle(class_name):
    import threading

    recorder = _Recorder()
    ref = load_reference(
        "VRGDG_GeneralNodes2.py", [class_name],
        extra_globals={"PromptServer": _fake_prompt_server(recorder),
                       "threading": threading, "any_typ": "*"})
    return ref[class_name](), recorder


# ---------------------------------------------------------------------------
# fuzz generators
# ---------------------------------------------------------------------------

_NAMES = ["[none]", "", "  ", "style.safetensors", "dir/detail.safetensors",
          "face fix.pt", "x", None, " [none] "]
_STRENGTHS = [1.0, 0.5, 0.0, -0.25, 2.0, "0.75", "abc", None, 100.0]


def _random_lora_payload(rng, two_pass_strengths=False):
    payload = {
        "use_custom_loras": rng.choice(
            [True, False, "true", "True ", "false", "yes", 1, 0]),
        "lora_count": rng.choice([-3, 0, 1, 3, 7, 25, "5", "x", 2.9]),
    }
    if not two_pass_strengths:
        payload["ltx_two_pass_mode"] = rng.choice(
            [True, False, "true", "false", 0, 1])
    for slot in range(1, 9):
        if rng.random() < 0.8:
            payload[f"lora_{slot}"] = rng.choice(_NAMES)
        if two_pass_strengths:
            if rng.random() < 0.8:
                payload[f"first_pass_strength_{slot}"] = rng.choice(_STRENGTHS)
            if rng.random() < 0.8:
                payload[f"second_pass_strength_{slot}"] = rng.choice(
                    _STRENGTHS)
        elif rng.random() < 0.8:
            payload[f"strength_{slot}"] = rng.choice(_STRENGTHS)
    return payload


def _expected_applications(plan):
    return [(f"/fake/loras/{name}", strength)
            for name, strength in plan["first_pass"] + plan["second_pass"]]


# ---------------------------------------------------------------------------
# multi-LoRA loaders
# ---------------------------------------------------------------------------

def test_multi_lora_plan_matches_reference_applications():
    rng = random.Random(0xF0F0)
    node, recorder = _lora_oracle("VRGDG_OptionalMultiLoraModelOnly")
    for _ in range(300):
        payload = _random_lora_payload(rng)
        recorder.calls.clear()
        model = {"base": True}
        first, second, names = node.apply_loras(model, **payload)
        plan = graph_plans.multi_lora_plan(payload)
        assert recorder.calls == _expected_applications(plan)
        assert names == plan["lora_names"]
        if plan["passthrough"]:
            assert first is model and second is model and names == ""


def test_two_pass_strengths_plan_matches_reference():
    rng = random.Random(0xBEE5)
    node, recorder = _lora_oracle("VRGDG_OptionalMultiLoraTwoPassStrengths")
    for _ in range(300):
        payload = _random_lora_payload(rng, two_pass_strengths=True)
        recorder.calls.clear()
        model = {"base": True}
        first, second, names = node.apply_loras(model, **payload)
        plan = graph_plans.two_pass_lora_plan(payload)
        assert recorder.calls == _expected_applications(plan)
        assert names == plan["lora_names"]
        if plan["passthrough"]:
            assert first is model and second is model


def test_lora_path_plan_matches_reference(tmp_path):
    node, recorder = _lora_oracle("VRGDG_LoraFromPathModelOnly")
    good = tmp_path / "fresh lora.safetensors"
    good.write_bytes(b"\0")
    wrong_ext = tmp_path / "notes.txt"
    wrong_ext.write_bytes(b"\0")

    cases = [(str(good), 0.8), (f'  "{good}"  ', -1.5), (str(good), 0.0),
             ("", 1.0), (str(tmp_path / "missing.safetensors"), 1.0),
             (str(wrong_ext), 1.0), (None, 2.0)]
    for raw_path, strength in cases:
        recorder.calls.clear()
        model = {"base": True}
        try:
            expected = node.apply_lora(model, raw_path, strength)
            expected_error = None
        except ValueError as exc:
            expected_error = str(exc)
        if expected_error is None:
            plan = graph_plans.lora_path_plan(raw_path, strength)
            # the reference loads via comfy.utils directly (no folder
            # lookup), so recorded paths are the normalized input path
            assert recorder.calls == plan["applications"]
            if plan["passthrough"]:
                assert expected[0] is model
        else:
            with pytest.raises(ValueError) as caught:
                graph_plans.lora_path_plan(raw_path, strength)
            assert str(caught.value) == expected_error


# ---------------------------------------------------------------------------
# mute / group state switchers
# ---------------------------------------------------------------------------

_ID_TEXTS = ["", "1,2,3", "4; 5;4", " 7 , x, -3, 08", "3.5, 2", None,
             "9," * 5, ";;,", "0"]


def test_mute_state_plan_matches_reference():
    node, recorder = _switch_oracle("VRGDG_SetMuteStateMulti")
    for text in _ID_TEXTS:
        for set_state in (True, False):
            for off_mode in ("mute", "bypass"):
                recorder.calls.clear()
                node.doit(object(), text, set_state, off_mode)
                assert recorder.calls == graph_plans.mute_state_plan(
                    text, set_state, off_mode)


_TARGET_JSONS = [
    "[]", "", "not json", "{\"action\": \"mute\"}",
    '[{"action": "bypass", "node_ids": [1, 2, "3"]}]',
    '[{"action": "ACTIVE", "node_ids": [4]}, {"node_ids": [5, -1, "x"]}]',
    '[{"action": "active", "node_ids": "7"}, 12, null,'
    ' {"action": null, "node_ids": [3.9]}]',
    '[{"node_ids": []}]',
]


def test_group_state_plan_matches_reference():
    node, recorder = _switch_oracle("VRGDG_SetGroupStateMulti")
    rng = random.Random(0xD00D)
    for targets_json in _TARGET_JSONS:
        for csv in _ID_TEXTS:
            recorder.calls.clear()
            action = rng.choice(["active", "mute", "bypass"])
            node.doit(object(), 1, action, False, 0.0, csv, targets_json)
            plan = graph_plans.group_state_plan(targets_json, csv, action,
                                                False, 0.0)
            assert recorder.calls == plan["events"]
            assert plan["queue_after_seconds"] is None


def test_group_state_plan_immediate_requeue():
    node, recorder = _switch_oracle("VRGDG_SetGroupStateMulti")
    node.doit(object(), 1, "mute", True, 0.0, "1,2", "[]")
    plan = graph_plans.group_state_plan("[]", "1,2", "mute", True, 0.0)
    assert recorder.calls == plan["events"]
    assert plan["queue_after_seconds"] == 0.0
    assert plan["events"][-1] == ("impact-add-queue", {})


def test_group_state_plan_delayed_requeue():
    node, recorder = _switch_oracle("VRGDG_SetGroupStateMulti")
    node.doit(object(), 1, "mute", True, 0.02, "6", "[]")
    plan = graph_plans.group_state_plan("[]", "6", "mute", True, 0.02)
    # the reference defers the requeue to a thread; the plan reports the
    # delay instead of inlining the event
    assert plan["queue_after_seconds"] == pytest.approx(0.02)
    assert all(event != "impact-add-queue" for event, _ in plan["events"])
    deadline = time.time() + 2.0
    while time.time() < deadline:
        if ("impact-add-queue", {}) in recorder.calls:
            break
        time.sleep(0.01)
    assert recorder.calls == plan["events"] + [("impact-add-queue", {})]


def test_group_state_plan_no_requeue_when_nothing_applied():
    node, recorder = _switch_oracle("VRGDG_SetGroupStateMulti")
    node.doit(object(), 1, "mute", True, 0.0, "", "[]")
    plan = graph_plans.group_state_plan("[]", "", "mute", True, 0.0)
    assert recorder.calls == plan["events"] == []
    assert plan["queue_after_seconds"] is None


def test_payload_dispatchers_coerce_string_booleans():
    """Form-built clients send "false" strings; bool("false") is True —
    the dispatchers must use the loaders' _truthy coercion."""
    plan = graph_plans.state_plan_from_payload(
        {"mode": "mute", "node_ids": "3", "set_state": "false",
         "off_mode": "bypass"})
    assert plan["events"][0][0] == "impact-bridge-continue"

    plan = graph_plans.state_plan_from_payload(
        {"node_ids_csv": "5", "group_action": "mute",
         "auto_queue_next": "false"})
    assert plan["queue_after_seconds"] is None
    assert all(event[0] != "impact-add-queue" for event in plan["events"])

    plan = graph_plans.state_plan_from_payload(
        {"node_ids_csv": "5", "group_action": "bypass",
         "auto_queue_next": "true"})
    assert plan["events"][0][1]["bypasses"] == ["5"]
    assert plan["events"][-1] == ("impact-add-queue", {})
