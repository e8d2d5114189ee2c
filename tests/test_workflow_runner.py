"""Oracle fuzz: workflow-runner prompt builders vs the reference.

Each builder's output prompt JSON is compared (recursive dict equality)
against the AST-extracted reference patch function running on the SAME
template file with a faked ``folder_paths`` whose model lists mirror the
test catalog.  ``workflow_path`` is compared by basename (ours points at
the vendored copy).  Error behavior is compared as raised/not-raised.
"""

import json
import os
import sys
import wave

import numpy as np
import pytest

from tests.reference_oracle import load_reference
from vrgdg_tpu.api import workflow_runner as wr

REF_FILE = "VRGDG_WorkflowRunnerNodes.py"

MODEL_LISTS = {
    "loras": ["a.safetensors", "sub\\b.safetensors",
              "licon\\LTX-2.3-Licon-MSR-V1.safetensors",
              "ltx-2.3-22b-ic-lora-ingredients-0.9.safetensors",
              "lora_weights.safetensors",
              "minimax_h3_turbo_4step_ema_ckpt850.safetensors"],
    "unet": ["z_image_turbo_bf16.safetensors", "model.gguf"],
    "diffusion_models": ["krea2_turbo_fp8_scaled.safetensors",
                         "minimax_h3_ref2va_pruned_int8_convrot.safetensors"],
    "clip": ["qwen_3_4b.safetensors"],
    "text_encoders": ["qwen3vl_4b_fp8_scaled.safetensors",
                      "qwen3vl_32b_minimax_h3_nvfp4_awq.safetensors"],
    "vae": ["qwen_image_vae.safetensors", "ae.safetensors",
            "minimax_h3_video_vae_fp16.safetensors",
            "minimax_h3_audio_vae_fp32.safetensors"],
    "upscale_models": ["4x.safetensors"],
}

_STATE = {"input_dir": "", "output_dir": ""}


class _FakeFolderPaths:
    models_dir = None

    @staticmethod
    def get_filename_list(category):
        return list(MODEL_LISTS.get(category, []))

    @staticmethod
    def get_folder_paths(category):
        return []

    @staticmethod
    def get_input_directory():
        return _STATE["input_dir"]

    @staticmethod
    def get_output_directory():
        return _STATE["output_dir"]


class _TimingShim:
    def __init__(self, plan):
        self._plan = dict(plan)
        self.__dict__.update(self._plan)

    def to_dict(self):
        return dict(self._plan)


def _fake_timing(*args, **kwargs):
    from vrgdg_tpu.runtime.minimax_h3 import calculate_minimax_h3_timing
    return _TimingShim(calculate_minimax_h3_timing(*args, **kwargs))


_CLOSURE = [
    "_MAX_LORA_SLOTS", "_NONE_LORA", "_REQUIRED_LTX_MSR_LORA",
    "_REQUIRED_LTX_INGREDIENTS_LORA", "_REQUIRED_LTX_ID_LORA",
    "_MIN_LTX_INGREDIENTS_FRAMES", "_DEFAULT_I2V_PASS1_SIGMAS",
    "_DEFAULT_I2V_PASS2_SIGMAS", "_DEFAULT_INGREDIENTS_SAMPLER",
    "_MINIMAX_H3_ASPECT_RATIOS", "_MINIMAX_H3_MAX_REFERENCE_IMAGES",
    "_MINIMAX_H3_MAX_REFERENCE_VIDEOS", "_I2V_UNET_ALIASES",
    "_PLACEHOLDER_I2I_IMAGE_NAME", "_PLACEHOLDER_I2I_IMAGE_BASE64",
    "_MINIMAX_H3_SAGE_ATTENTION_MODES",
    "_lora_choices", "_folder_choices", "_ltx_video_model_choices",
    "_model_choice_exists", "_require_model_choice",
    "_manual_model_folder_choices", "_clean_i2v_unet_name",
    "_replace_api_input_refs", "_collapse_ltx_video_model_switch",
    "_patch_ltx_video_model_loader", "_load_api_template",
    "_api_node_id_by_class", "_int_payload", "_float_payload",
    "_bool_payload", "_first_payload_value", "_clean_lora_name",
    "_clean_msr_lora_name", "_clean_required_id_lora_name",
    "_prepare_load_image_name", "_prepare_optional_input_image_name",
    "_resolve_existing_file", "_ensure_placeholder_load_image",
    "_set_api_input", "_scene_render_output_folder",
    "_set_optional_api_input", "_normalize_sigma_list_text",
    "_patch_ltx_two_pass_sampler_overrides",
    "_patch_ltx_ingredients_sampler_overrides",
    "_patch_ltx_single_pass_sampler_overrides", "_patch_i2v_node_overrides",
    "_api_node_title", "_optional_api_node_id_by_class",
    "_srt_time_to_seconds", "_srt_segment_frame_count",
    "_pad_ingredients_preroll_tail", "_rtv_reference_strength",
    "_rtv_background_mode", "_image_paths_from_payload_ingredients",
    "_looks_like_prompt_text", "_looks_like_api_key",
    "_patch_zimage_api_prompt", "_patch_krea2_api_prompt",
    "_patch_ernie_image_api_prompt", "_patch_krea2_2pass_api_prompt",
    "_patch_flux_klein_api_prompt", "_patch_nb_image_api_prompt",
    "_patch_z_upscale_enhance_api_prompt", "_patch_i2v_api_prompt",
    "_patch_t2v_api_prompt", "_patch_rtv_api_prompt",
    "_patch_ingredients_api_prompt", "_id_lora_source_image_path",
    "_id_lora_reference_audio_path", "_patch_id_lora_api_prompt",
    "_patch_flf_api_prompt", "_build_flf_api_prompt",
    "_flf_api_template_path",
    "_patch_transcribe_api_prompt",
    "_patch_timestamped_transcribe_api_prompt",
    "_minimax_h3_collection", "_minimax_h3_media_path",
    "_minimax_h3_image_paths", "_minimax_h3_video_references",
    "_minimax_h3_output_location", "_patch_minimax_h3_advanced_settings",
    "_patch_minimax_h3_turbo", "_patch_minimax_h3_loras",
    "_build_minimax_h3_api_prompt", "_minimax_h3_api_template_path",
    "_minimax_h3_built_in_audio_api_template_path",
]


@pytest.fixture(scope="module")
def ref():
    import copy as copy_mod
    import hashlib as hashlib_mod
    import random as random_mod

    from tests.reference_oracle import REFERENCE_ROOT

    return load_reference(REF_FILE, _CLOSURE, extra_globals={
        "__file__": os.path.join(REFERENCE_ROOT, REF_FILE),
        "copy": copy_mod,
        "hashlib": hashlib_mod,
        "random": random_mod,
        "folder_paths": _FakeFolderPaths,
        "register_custom_model_root": lambda *a, **k: True,
        "custom_model_root_subfolders": lambda category: [],
        "load_custom_model_root": lambda: {"models_root": ""},
        "calculate_minimax_h3_timing": _fake_timing,
        "print": lambda *a, **k: None,
    })


@pytest.fixture()
def env(tmp_path, monkeypatch):
    """Point both implementations at the same tmp input/output roots and
    freeze the ingest-name timestamp."""
    input_dir = tmp_path / "input"
    output_dir = tmp_path / "output"
    input_dir.mkdir()
    output_dir.mkdir()
    _STATE["input_dir"] = str(input_dir)
    _STATE["output_dir"] = str(output_dir)
    monkeypatch.setenv("VRGDG_TPU_INPUT", str(input_dir))
    monkeypatch.setattr(wr, "DEFAULT_OUTPUT_ROOT", str(output_dir))
    monkeypatch.setattr(wr.time, "time", lambda: 1234.567)
    catalog = wr.ModelCatalog(overrides=MODEL_LISTS)
    return {"tmp": tmp_path, "catalog": catalog,
            "input": str(input_dir), "output": str(output_dir)}


def _template(key):
    return json.loads(open(wr.template_path(key), encoding="utf-8").read())


def _rng(seed):
    return np.random.default_rng(seed)


def _lora_fields(rng, prefix_count=4):
    fields = {}
    if rng.random() < 0.7:
        fields["use_custom_loras"] = bool(rng.random() < 0.6)
        fields["lora_count"] = int(rng.integers(0, 6))
        for slot in range(1, prefix_count + 1):
            fields[f"lora_{slot}"] = str(rng.choice(
                ["a.safetensors", "sub\\b.safetensors", "missing.safetensors",
                 "[none]", ""]))
            if rng.random() < 0.5:
                fields[f"strength_{slot}"] = float(rng.uniform(-2, 2))
            if rng.random() < 0.4:
                fields[f"first_pass_strength_{slot}"] = float(
                    rng.uniform(-2, 2))
            if rng.random() < 0.4:
                fields[f"second_pass_strength_{slot}"] = float(
                    rng.uniform(-2, 2))
    return fields


def _compare(mine, theirs_prompt, extra=()):
    assert mine["prompt"] == theirs_prompt, "prompt JSON diverged"
    for key, value in extra:
        assert mine[key] == value, (key, mine[key], value)


def _both(builder, patch, payload):
    """Run both sides; when one raises, the other must raise too."""
    my_exc = their_exc = None
    mine = theirs = None
    try:
        mine = builder(payload)
    except Exception as exc:  # noqa: BLE001 - parity harness
        my_exc = exc
    try:
        theirs = patch(payload)
    except Exception as exc:  # noqa: BLE001
        their_exc = exc
    assert (my_exc is None) == (their_exc is None), \
        f"error parity: mine={my_exc!r} theirs={their_exc!r}"
    return mine, theirs


def test_zimage_prompt_parity(ref, env):
    rng = _rng(1)
    for case in range(30):
        payload = {"prompt": "a scenic view" if case != 3 else "",
                   "seed": int(rng.integers(0, 2**40)),
                   "first_pass_width": int(rng.integers(-50, 6000)),
                   "second_pass_height": str(rng.integers(0, 5000)),
                   "batch_size": int(rng.integers(0, 40)),
                   "image_to_image_start_at_step": float(rng.uniform(0, 12)),
                   "ltx_two_pass_mode": bool(rng.random() < 0.5),
                   **_lora_fields(rng)}
        mine, theirs = _both(
            lambda pl: wr.build_zimage_prompt(pl, catalog=env["catalog"]),
            lambda pl: ref["_patch_zimage_api_prompt"](
                _template("zimage"), pl),
            payload)
        if mine is None:
            continue
        prompt, seed = theirs
        _compare(mine, prompt, [("used_seed", seed)])


def test_ernie_prompt_parity(ref, env):
    rng = _rng(2)
    for case in range(25):
        payload = {"prompt": "neon city", "seed": int(rng.integers(0, 2**31)),
                   "width": int(rng.integers(32, 5000)),
                   "height": int(rng.integers(32, 5000)),
                   "unet_name": str(rng.choice(["u.safetensors", "", None])),
                   **_lora_fields(rng)}
        mine, theirs = _both(
            lambda pl: wr.build_ernie_image_prompt(pl,
                                                   catalog=env["catalog"]),
            lambda pl: ref["_patch_ernie_image_api_prompt"](
                _template("ernie_image"), pl),
            payload)
        if mine is None:
            continue
        prompt, seed = theirs
        _compare(mine, prompt, [("used_seed", seed)])


def test_krea2_prompt_parity(ref, env):
    rng = _rng(3)
    for case in range(30):
        payload = {"prompt": "a castle on a hill",
                   "seed": int(rng.integers(0, 2**31)),
                   "width": int(rng.integers(200, 4096)),
                   "height": int(rng.integers(200, 4096)),
                   "first_pass_width": int(rng.integers(100, 2000)),
                   "first_pass_height": int(rng.integers(100, 2000)),
                   "use_zimage_enhance": bool(rng.random() < 0.7),
                   "zimage_enhance_strength": float(rng.uniform(-1, 2)),
                   "batch_size": int(rng.integers(0, 20))}
        if rng.random() < 0.3:
            payload["unet_name"] = "not_installed.safetensors"
        mine, theirs = _both(
            lambda pl: wr.build_krea2_prompt(pl, catalog=env["catalog"]),
            lambda pl: ref["_patch_krea2_api_prompt"](_template("krea2"), pl),
            payload)
        if mine is None:
            continue
        prompt, seed = theirs
        _compare(mine, prompt, [("used_seed", seed)])


def test_krea2_2pass_prompt_parity(ref, env):
    rng = _rng(4)
    for case in range(30):
        payload = {"prompt": "portrait in rain",
                   "seed": int(rng.integers(0, 2**31)),
                   "aspect_ratio": str(rng.choice(
                       ["16:9 (Widescreen)", "1:1 (Square)", ""])),
                   "cfg": float(rng.uniform(0.5, 2.0)),
                   "sampler_name": str(rng.choice(["euler", ""])),
                   "image_to_image_creativity": int(rng.integers(-5, 15)),
                   "use_loras": bool(rng.random() < 0.4),
                   **_lora_fields(rng)}
        mine, theirs = _both(
            lambda pl: wr.build_krea2_2pass_prompt(pl,
                                                   catalog=env["catalog"]),
            lambda pl: ref["_patch_krea2_2pass_api_prompt"](
                _template("krea2_2pass"), pl),
            payload)
        if mine is None:
            continue
        prompt, seed = theirs
        _compare(mine, prompt, [("used_seed", seed)])


def test_flux_klein_and_nb_prompt_parity(ref, env):
    rng = _rng(5)
    img = env["tmp"] / "ing.png"
    img.write_bytes(b"\x89PNG\r\n\x1a\nxx")
    for case in range(25):
        ingredients = []
        if rng.random() < 0.6:
            ingredients = [{"path": str(img)}] * int(rng.integers(1, 3))
        payload = {"prompt": "two subjects dancing in a large hall",
                   "seed": int(rng.integers(0, 2**31)),
                   "width": int(rng.integers(100, 4096)),
                   "height": int(rng.integers(100, 4096)),
                   "image_ingredients": ingredients,
                   **_lora_fields(rng)}
        mine, theirs = _both(
            lambda pl: wr.build_flux_klein_prompt(pl,
                                                  catalog=env["catalog"]),
            lambda pl: ref["_patch_flux_klein_api_prompt"](
                _template("flux_klein"), pl),
            payload)
        if mine is not None:
            _compare(mine, theirs)

        nb_payload = {"prompt": "a quiet village under snowfall at dusk",
                      "api_key": "AIzaSyFakeKey1234567890",
                      "model": str(rng.choice(["", "gemini-x"])),
                      "image_ingredients": ingredients}
        if case == 7:  # swapped fields
            nb_payload["prompt"], nb_payload["api_key"] = \
                nb_payload["api_key"], nb_payload["prompt"]
        mine, theirs = _both(
            lambda pl: wr.build_nb_image_prompt(pl, catalog=env["catalog"]),
            lambda pl: ref["_patch_nb_image_api_prompt"](
                _template("nb_image"), pl),
            nb_payload)
        if mine is not None:
            _compare(mine, theirs)


def test_z_upscale_enhance_prompt_parity(ref, env):
    rng = _rng(6)
    source = env["tmp"] / "src.png"
    source.write_bytes(b"\x89PNG\r\n\x1a\nyy")
    for case in range(20):
        payload = {"prompt": str(rng.choice(["enhance this", ""])),
                   "seed": int(rng.integers(0, 2**31)),
                   "width": int(rng.integers(100, 5000)),
                   "height": int(rng.integers(100, 5000)),
                   "enhance_amount": int(rng.integers(-3, 30)),
                   "source_image_path": str(source),
                   **_lora_fields(rng)}
        mine, theirs = _both(
            lambda pl: wr.build_z_upscale_enhance_prompt(
                pl, catalog=env["catalog"]),
            lambda pl: ref["_patch_z_upscale_enhance_api_prompt"](
                _template("z_upscale_enhance"), pl),
            payload)
        if mine is None:
            continue
        prompt, seed = theirs
        _compare(mine, prompt, [("used_seed", seed)])


def _scene_files(env, rng, srt_lines=3):
    audio = env["tmp"] / "audio.wav"
    if not audio.exists():
        with wave.open(str(audio), "wb") as handle:
            handle.setnchannels(1)
            handle.setsampwidth(2)
            handle.setframerate(8000)
            handle.writeframes(b"\x00\x00" * 8000)
    srt = env["tmp"] / "scenes.srt"
    if not srt.exists():
        blocks = []
        start = 0.0
        for index in range(srt_lines):
            end = start + float(rng.integers(2, 6))
            blocks.append(
                f"{index + 1}\n"
                f"00:00:{start:06.3f} --> 00:00:{end:06.3f}\n"
                f"line {index + 1}\n".replace(".", ","))
            start = end
        srt.write_text("\n".join(blocks), encoding="utf-8")
    project = env["tmp"] / "project"
    project.mkdir(exist_ok=True)
    return str(audio), str(srt), str(project)


def test_i2v_t2v_prompt_parity(ref, env):
    rng = _rng(7)
    audio, srt, project = _scene_files(env, rng)
    image_folder = env["tmp"] / "frames"
    image_folder.mkdir(exist_ok=True)
    for case in range(20):
        common = {"audio_path": audio, "srt_path": srt,
                  "project_folder": project,
                  "scene_number": int(rng.integers(0, 4)),
                  "prompt_number_one_based": int(rng.integers(1, 5)),
                  "fps": int(rng.integers(1, 80)),
                  "width": int(rng.integers(100, 4096)),
                  "height": int(rng.integers(100, 4096)),
                  "seed": int(rng.integers(0, 2**40)),
                  "use_gguf_model": bool(rng.random() < 0.5),
                  "unet_name": str(rng.choice(
                      ["model.gguf",
                       "LTX-2.3-22B-distilled-11-Q6_K.gguf", ""])),
                  "pass1_sigmas": str(rng.choice(
                      ["", "1.0, 0.5, 0.0", "garbage,list"])),
                  "pass1_inplace_strength": float(rng.uniform(-1, 2)),
                  "tail_loss_frames": int(rng.integers(0, 100)),
                  "pre_frames": int(rng.integers(0, 100)),
                  **_lora_fields(rng)}
        i2v_payload = {**common, "i2v_prompt": "singer on a rooftop",
                       "image_folder": str(image_folder),
                       "image_index_zero_based": int(rng.integers(0, 9))}
        mine, theirs = _both(
            lambda pl: wr.build_i2v_prompt(pl, catalog=env["catalog"]),
            lambda pl: ref["_patch_i2v_api_prompt"](_template("i2v"), pl),
            i2v_payload)
        if mine is not None:
            prompt, folder = theirs
            _compare(mine, prompt, [("output_folder", folder)])

        t2v_payload = {**common, "t2v_prompt": "city time-lapse"}
        mine, theirs = _both(
            lambda pl: wr.build_t2v_prompt(pl, catalog=env["catalog"]),
            lambda pl: ref["_patch_t2v_api_prompt"](_template("t2v"), pl),
            t2v_payload)
        if mine is not None:
            prompt, folder = theirs
            _compare(mine, prompt, [("output_folder", folder)])


def test_rtv_ingredients_prompt_parity(ref, env):
    rng = _rng(8)
    audio, srt, project = _scene_files(env, rng)
    image = env["tmp"] / "ref_image.png"
    image.write_bytes(b"\x89PNG\r\n\x1a\nzz")
    for case in range(20):
        common = {"audio_path": audio, "srt_path": srt,
                  "project_folder": project,
                  "prompt_number_one_based": int(rng.integers(1, 6)),
                  "fps": int(rng.integers(1, 60)),
                  "seed": int(rng.integers(0, 2**40)),
                  "tail_loss_frames": int(rng.integers(0, 60)),
                  "pre_frames": int(rng.integers(0, 60)),
                  **_lora_fields(rng)}
        rtv_payload = {
            **common, "t2v_prompt": "band performing",
            "msr_lora_name": str(rng.choice(
                ["licon/LTX-2.3-Licon-MSR-V1.safetensors", "", "unknown"])),
            "msr_reference_strength": str(rng.choice(
                ["17", "25 - balanced", "41x", "auto", ""])),
            "msr_background_mode": str(rng.choice(
                ["neutral", "uploaded", ""])),
            "rtv_references": {
                "subjects": [{"path": "subj1.png"}, {"path": "subj2.png"}]
                if rng.random() < 0.5 else [],
                "use_subject_placeholder": bool(rng.random() < 0.5),
            },
        }
        mine, theirs = _both(
            lambda pl: wr.build_rtv_prompt(pl, catalog=env["catalog"]),
            lambda pl: ref["_patch_rtv_api_prompt"](_template("rtv"), pl),
            rtv_payload)
        if mine is not None:
            prompt, folder = theirs
            _compare(mine, prompt, [("output_folder", folder)])

        ing_payload = {**common, "t2v_prompt": "ingredient shot",
                       "ingredients_image_path": str(image),
                       "width": int(rng.integers(64, 2000)),
                       "height": int(rng.integers(64, 2000))}
        mine, theirs = _both(
            lambda pl: wr.build_ingredients_prompt(pl,
                                                   catalog=env["catalog"]),
            lambda pl: ref["_patch_ingredients_api_prompt"](
                _template("ingredients"), pl),
            ing_payload)
        if mine is not None:
            prompt, folder = theirs
            _compare(mine, prompt, [("output_folder", folder)])


def test_id_lora_flf_prompt_parity(ref, env):
    rng = _rng(9)
    audio, srt, project = _scene_files(env, rng)
    image = env["tmp"] / "face.png"
    image.write_bytes(b"\x89PNG\r\n\x1a\nqq")
    for case in range(20):
        id_payload = {"id_lora_prompt": "close-up performance",
                      "source_image_path": str(image),
                      "reference_audio_path": audio,
                      "project_folder": project,
                      "fps": int(rng.integers(1, 60)),
                      "duration": float(rng.uniform(0, 10)),
                      "pass1_seed": int(rng.integers(0, 2**40)),
                      "identity_guidance_scale": float(rng.uniform(-2, 25)),
                      "id_lora_name": str(rng.choice(
                          ["lora_weights.safetensors", "", "missing.x"])),
                      "crf": int(rng.integers(-5, 60)),
                      **_lora_fields(rng)}
        mine, theirs = _both(
            lambda pl: wr.build_id_lora_prompt(pl, catalog=env["catalog"]),
            lambda pl: ref["_patch_id_lora_api_prompt"](
                _template("id_lora"), pl),
            id_payload)
        if mine is not None:
            prompt, folder = theirs
            _compare(mine, prompt, [("output_folder", folder)])

        flf_payload = {"i2v_prompt": "sunrise to sunset",
                       "audio_path": audio, "srt_path": srt,
                       "project_folder": project,
                       "first_frame": {"path": "first.png"},
                       "last_frame": {"path": str(rng.choice(
                           ["last.png", "first.png"]))},
                       "first_guide_strength": float(rng.uniform(-1, 2)),
                       "last_guide_interpolation": str(rng.choice(
                           ["lanczos", "bogus", "area"])),
                       **_lora_fields(rng)}
        mine, theirs = _both(
            lambda pl: wr.build_flf_prompt(pl, catalog=env["catalog"]),
            lambda pl: ref["_build_flf_api_prompt"](pl),
            flf_payload)
        if mine is not None:
            assert mine["prompt"] == theirs["prompt"]
            assert mine["output_folder"] == theirs["output_folder"]
            assert mine["flf_inputs"] == theirs["flf_inputs"]


def test_transcribe_prompt_parity(ref, env):
    rng = _rng(10)
    audio, srt, _project = _scene_files(env, rng)
    for case in range(15):
        payload = {"audio_path": audio, "srt_path": srt,
                   "reference_lyrics": str(rng.choice(["la la", ""])),
                   "language": str(rng.choice(["english", "", "spanish"])),
                   "fill_aggressiveness": int(rng.integers(-2, 6)),
                   "model_name": str(rng.choice(["large-v3", "", "tiny"]))}
        mine, theirs = _both(
            lambda pl: wr.build_transcribe_prompt(pl,
                                                  catalog=env["catalog"]),
            lambda pl: ref["_patch_transcribe_api_prompt"](
                _template("transcribe"), pl),
            payload)
        if mine is not None:
            _compare(mine, theirs)

        tt_payload = {"audio_path": audio,
                      "segment_mode": str(rng.choice(
                          ["whisper_chunks", "reference_lines", "bogus"])),
                      "min_gap_seconds": float(rng.uniform(-1, 40)),
                      "max_scene_seconds": float(rng.uniform(0, 80))}
        mine, theirs = _both(
            lambda pl: wr.build_timestamped_transcribe_prompt(
                pl, catalog=env["catalog"]),
            lambda pl: ref["_patch_timestamped_transcribe_api_prompt"](
                _template("timestamped_transcribe"), pl),
            tt_payload)
        if mine is not None:
            _compare(mine, theirs)


def test_minimax_h3_prompt_parity(ref, env):
    rng = _rng(11)
    _audio, _srt, project = _scene_files(env, rng)
    for case in range(20):
        payload = {"audio_mode": "built_in_audio",
                   "prompt": "drummer in the rain",
                   "project_folder": project,
                   "scene_number": int(rng.integers(1, 8)),
                   "timeline_start_seconds": float(rng.integers(0, 10)),
                   "scene_duration_seconds": float(rng.integers(2, 8)),
                   "warmup_frames": int(rng.integers(0, 30)),
                   "cooldown_frames": int(rng.integers(0, 30)),
                   "aspect_ratio": str(rng.choice(
                       ["16:9 (Widescreen)", "1:1 (Square)", "weird"])),
                   "megapixels": float(rng.uniform(0, 20)),
                   "seed": int(rng.integers(-3, 2**40)),
                   "sampler_name": str(rng.choice(["res_multistep", ""])),
                   "steps": int(rng.integers(0, 50)),
                   "easy_cache_bypass": bool(rng.random() < 0.3),
                   "sage_attention": str(rng.choice(
                       ["auto", "sageattn3", "nope"])),
                   "image_paths": [f"img_{i}.png" for i in
                                   range(int(rng.integers(0, 4)))],
                   "video_references": [
                       {"path": "clip.mp4",
                        "start_seconds": float(rng.integers(0, 5)),
                        "use_audio": bool(rng.random() < 0.5)}
                   ] if rng.random() < 0.5 else []}
        if rng.random() < 0.3:
            payload["use_loras"] = True
            payload["lora_count"] = int(rng.integers(0, 3))
            payload["lora_1"] = str(rng.choice(
                ["a.safetensors", "missing.safetensors"]))
        if payload.get("seed", 0) < 0:
            payload["seed"] = 3  # random seeds cannot be compared
        mine, theirs = _both(
            lambda pl: wr.build_minimax_h3_prompt(pl,
                                                  catalog=env["catalog"]),
            lambda pl: ref["_build_minimax_h3_api_prompt"](pl),
            payload)
        if mine is None:
            continue
        assert mine["prompt"] == theirs["prompt"]
        assert mine["used_seed"] == theirs["used_seed"]
        assert mine["timing"] == theirs["timing"]
        assert mine["output_folder"] == theirs["output_folder"]
        assert mine["advanced_settings"] == theirs["advanced_settings"]
        assert mine["lora_settings"] == theirs["lora_settings"]
        assert mine["turbo_settings"] == theirs["turbo_settings"]
        assert mine["reference_inputs"] == theirs["reference_inputs"]
        assert os.path.basename(mine["workflow_path"]) == \
            os.path.basename(theirs["workflow_path"])


def test_minimax_h3_turbo_parity(ref, env):
    """Turbo rewiring: reference checks live ComfyUI registrations, so a
    fake `nodes` module stands in; the standalone builder leaves that
    liveness check to the executor."""
    rng = _rng(12)
    _a, _s, project = _scene_files(env, rng)
    fake_nodes = type(sys)("nodes")
    fake_nodes.NODE_CLASS_MAPPINGS = {"MiniMaxH3TurboLoRA": object,
                                      "MiniMaxH3TurboSampler": object}
    sys.modules["nodes"] = fake_nodes
    try:
        payload = {"audio_mode": "built_in_audio", "prompt": "turbo scene",
                   "project_folder": project, "scene_number": 2,
                   "timeline_start_seconds": 0,
                   "scene_duration_seconds": 4.0,
                   "use_turbo_lora": True, "steps": 4,
                   "turbo_lora_strength": 0.8}
        mine = wr.build_minimax_h3_prompt(payload, catalog=env["catalog"])
        theirs = ref["_build_minimax_h3_api_prompt"](payload)
        assert mine["prompt"] == theirs["prompt"]
        assert mine["turbo_settings"] == theirs["turbo_settings"]
        assert mine["advanced_settings"] == theirs["advanced_settings"]
    finally:
        sys.modules.pop("nodes", None)


def test_choices_surface(env):
    choices = wr.i2v_choices(env["catalog"])
    assert choices["video_gguf_unets"] == ["model.gguf"]
    assert "krea2_turbo_fp8_scaled.safetensors" in \
        choices["video_diffusion_models"]
    assert wr.lora_list(env["catalog"])["loras"][0] == "[none]"


def test_catalog_scans_model_root(tmp_path):
    root = tmp_path / "models"
    (root / "loras" / "sub").mkdir(parents=True)
    (root / "loras" / "top.safetensors").write_bytes(b"x")
    (root / "loras" / "sub" / "nested.safetensors").write_bytes(b"x")
    (root / "loras" / "ignored.txt").write_bytes(b"x")
    catalog = wr.ModelCatalog(root=str(root))
    names = set(catalog.names("loras"))
    assert names == {"top.safetensors", os.path.join("sub",
                                                     "nested.safetensors")}
    assert catalog.exists("loras", "nested.safetensors")  # basename match
    assert not catalog.exists("loras", "ignored.txt")


def test_model_root_persistence(tmp_path, monkeypatch):
    monkeypatch.delenv("VRGDG_TPU_MODELS", raising=False)
    base = str(tmp_path)
    assert wr.load_model_root(base)["models_root"] == ""
    saved = wr.save_model_root(str(tmp_path), base)
    assert saved["models_root"] == str(tmp_path)
    assert wr.load_model_root(base)["models_root"] == str(tmp_path)
    with pytest.raises(ValueError, match="not a directory"):
        wr.save_model_root(str(tmp_path / "missing"), base)
    monkeypatch.setenv("VRGDG_TPU_MODELS", "/env/root")
    assert wr.load_model_root(base) == {"models_root": "/env/root",
                                        "source": "env"}
