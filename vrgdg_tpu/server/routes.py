"""Standalone HTTP API: the reference's ``/vrgdg/...`` route surface without
the ComfyUI PromptServer host.

Route parity targets:
- enhancer routes ``/vrgdg/video_enhancer/{upload,load,preview,render/start,
  render/status,render/cancel,media}``
  (``VRGDG_StandaloneVideoEnhancerNodes.py:756-867``),
- LUT/grain/adjust routes under ``/vrgdg/music_builder/...``
  (``VRGDG_LUTVideoTools.py:1424-1619``): catalog, example images, image and
  video appliers, previews, preset CRUD.

Handlers are thin wrappers over :mod:`vrgdg_tpu.api` and
:mod:`vrgdg_tpu.jobs`; all responses are ``{"ok": bool, ...}`` JSON like
the reference.  Blocking media work runs in the default executor so the
event loop stays responsive while a render is active.
"""

from __future__ import annotations

import asyncio
import functools
import subprocess
import os
import time
import uuid

from aiohttp import web

from .. import api
from ..api import paths, scene_render, workflow_runner
from ..jobs import enhancer as enh
from ..runtime import video_io


def _ok(**payload):
    return web.json_response({"ok": True, **payload})


def _err(exc, status=400):
    return web.json_response({"ok": False, "error": str(exc)}, status=status)


def _handler(fn):
    """Wrap a sync handler body: run in executor, JSON-wrap errors."""

    @functools.wraps(fn)
    async def wrapper(request):
        loop = asyncio.get_running_loop()
        try:
            if asyncio.iscoroutinefunction(fn):
                return await fn(request)
            return await loop.run_in_executor(None, fn, request)
        except FileNotFoundError as exc:
            return _err(exc, status=404)
        except Exception as exc:  # noqa: BLE001 — boundary
            return _err(exc)

    return wrapper


async def _json(request):
    try:
        return await request.json()
    except Exception:
        return {}


# GET routes that write project state anyway (export ingests media and
# rewrites session.json, matching the reference) must pass the same
# cross-site checks as POSTs
_MUTATING_GET_PATHS = frozenset({
    "/vrgdg/music_builder/export_project",
})


@web.middleware
async def _mutation_guard(request, handler):
    """Reject cross-site mutations.

    Every non-GET route can write user-supplied filesystem paths, so a
    hostile web page must not be able to drive them via CSRF against
    127.0.0.1: browsers attach an ``Origin`` header to cross-origin
    POSTs, which same-host requests (the bundled panel) and header-less
    local tools (curl, the CLI) never trip.  Setting ``VRGDG_TPU_TOKEN``
    additionally requires ``X-VRGDG-Token`` on all mutating requests.
    """
    mutating = request.method not in ("GET", "HEAD", "OPTIONS") \
        or request.path in _MUTATING_GET_PATHS
    if mutating:
        origin = request.headers.get("Origin")
        if origin:
            from urllib.parse import urlparse

            if urlparse(origin).netloc != request.headers.get("Host", ""):
                return web.json_response(
                    {"ok": False,
                     "error": "Cross-origin mutation rejected."},
                    status=403)
        token = os.environ.get("VRGDG_TPU_TOKEN", "")
        if token and request.headers.get("X-VRGDG-Token") != token:
            return web.json_response(
                {"ok": False,
                 "error": "Missing or invalid X-VRGDG-Token header."},
                status=403)
    return await handler(request)


async def _drain_part(part, sink) -> None:
    """Stream a multipart body part into ``sink(bytes)`` in 1 MiB chunks."""
    chunk = await part.read_chunk(1 << 20)
    while chunk:
        sink(chunk)
        chunk = await part.read_chunk(1 << 20)


def create_app(base_folder: str | None = None,
               luts_dir: str | None = None) -> web.Application:
    app = web.Application(client_max_size=1024 ** 3,
                          middlewares=[_mutation_guard])
    routes = web.RouteTableDef()
    registry = enh.JOBS

    # ---------------- video enhancer ----------------

    @routes.post("/vrgdg/video_enhancer/upload")
    @_handler
    async def enhancer_upload(request):
        reader = await request.multipart()
        saved_path = ""
        async for part in reader:
            if part.name != "video" or not part.filename:
                continue
            safe = video_io.safe_name(part.filename, "uploaded_video")
            if os.path.splitext(safe)[1].lower() not in video_io.VIDEO_EXTENSIONS:
                raise ValueError("Unsupported video type.")
            saved_path = os.path.join(
                enh.upload_folder(base_folder),
                f"{time.strftime('%Y%m%d_%H%M%S')}_{uuid.uuid4().hex[:8]}_{safe}")
            with open(saved_path, "wb") as handle:
                await _drain_part(part, handle.write)
            break
        if not saved_path:
            raise ValueError("No video was uploaded.")
        return _ok(video=video_io.probe_video(saved_path))

    @routes.post("/vrgdg/video_enhancer/load")
    @_handler
    async def enhancer_load(request):
        payload = await _json(request)
        return _ok(video=video_io.probe_video(payload.get("path")))

    @routes.post("/vrgdg/video_enhancer/preview")
    @_handler
    async def enhancer_preview(request):
        payload = await _json(request)
        loop = asyncio.get_running_loop()
        result = await loop.run_in_executor(
            None,
            lambda: enh.preview_frame(
                payload.get("source_path"),
                float(payload.get("timestamp") or 0),
                payload.get("settings"), base_folder=base_folder))
        return _ok(**result)

    @routes.post("/vrgdg/video_enhancer/render/start")
    @_handler
    async def enhancer_start(request):
        payload = await _json(request)
        job = enh.start_render(payload, payload.get("resume_job_id") or "",
                               registry=registry, base_folder=base_folder)
        return _ok(job=job)

    @routes.get("/vrgdg/video_enhancer/render/status")
    @_handler
    def enhancer_status(request):
        job_id = str(request.query.get("job_id") or "").strip()
        job = registry.snapshot(job_id)
        if not job:
            raise FileNotFoundError("Enhancement job was not found.")
        return _ok(job=job)

    @routes.post("/vrgdg/video_enhancer/render/cancel")
    @_handler
    async def enhancer_cancel(request):
        payload = await _json(request)
        job = enh.cancel_render(str(payload.get("job_id") or "").strip(),
                                registry=registry)
        return _ok(job=job)

    @routes.get("/vrgdg/video_enhancer/media")
    @_handler
    def enhancer_media(request):
        path = os.path.normpath(os.path.abspath(
            str(request.query.get("path") or "").strip()))
        # The reference's route served any extension-matched path, but it
        # ran inside ComfyUI; standalone, restrict to the roots this server
        # itself writes media into (outputs/uploads/previews/presets).
        roots = (enh.root_folder(base_folder),
                 paths.preview_root(base_folder),
                 os.path.abspath(base_folder or paths.DEFAULT_OUTPUT_ROOT))
        if not any(paths._inside(root, path) for root in roots):
            raise FileNotFoundError("Media file was not found.")
        if not os.path.isfile(path):
            raise FileNotFoundError("Media file was not found.")
        allowed = video_io.VIDEO_EXTENSIONS | {".png", ".jpg", ".jpeg", ".webp"}
        if os.path.splitext(path)[1].lower() not in allowed:
            raise ValueError("Unsupported media type.")
        return web.FileResponse(path)

    # ---------------- LUT / grain / adjust ----------------

    @routes.get("/vrgdg/music_builder/luts")
    @_handler
    def luts_list(request):
        return _ok(**api.list_luts(luts_dir))

    @routes.get("/vrgdg/music_builder/luts/example")
    @_handler
    def luts_example(request):
        name = str(request.query.get("name") or "")
        catalog = api.list_luts(luts_dir)
        path = os.path.join(catalog["examples_dir"], os.path.basename(name))
        if not os.path.isfile(path):
            raise FileNotFoundError("Example image was not found.")
        return web.FileResponse(path)

    def _sync_json_route(route_path, fn):
        @routes.post(route_path)
        @_handler
        async def handler(request, _fn=fn):
            payload = await _json(request)
            loop = asyncio.get_running_loop()
            result = await loop.run_in_executor(None, lambda: _fn(payload))
            return _ok(result=result)

    _sync_json_route(
        "/vrgdg/music_builder/luts/apply_image",
        lambda p: api.apply_lut_to_image(
            p.get("input"), p.get("lut"), p.get("output", ""),
            float(p.get("strength", 10.0)),
            replace_source=bool(p.get("replace_source")), luts_dir=luts_dir))
    _sync_json_route(
        "/vrgdg/music_builder/luts/apply_video",
        lambda p: api.apply_lut_to_video(
            p.get("input"), p.get("lut"), p.get("output", ""),
            float(p.get("strength", 10.0)),
            batch_size=int(p.get("batch_size", 8)),
            replace_source=bool(p.get("replace_source")),
            preserve_audio=bool(p.get("preserve_audio", True)),
            encode_crf=p.get("encode_crf", 23),
            encode_preset=p.get("encode_preset", "medium"),
            luts_dir=luts_dir))
    _sync_json_route(
        "/vrgdg/music_builder/luts/preview",
        lambda p: api.preview_lut_on_media(
            p.get("input"), p.get("lut"), float(p.get("strength", 10.0)),
            luts_dir=luts_dir, base=base_folder))
    _sync_json_route(
        "/vrgdg/music_builder/post_process/apply_film_grain_image",
        lambda p: api.apply_film_grain_to_image(
            p.get("input"), p.get("output", ""),
            float(p.get("grain_intensity", 0.04)),
            float(p.get("saturation_mix", 0.5)), p.get("seed"),
            replace_source=bool(p.get("replace_source"))))
    _sync_json_route(
        "/vrgdg/music_builder/post_process/apply_film_grain_video",
        lambda p: api.apply_film_grain_to_video(
            p.get("input"), p.get("output", ""),
            float(p.get("grain_intensity", 0.04)),
            float(p.get("saturation_mix", 0.5)), p.get("seed"),
            batch_size=int(p.get("batch_size", 8)),
            replace_source=bool(p.get("replace_source")),
            preserve_audio=bool(p.get("preserve_audio", True)),
            encode_crf=p.get("encode_crf", 26),
            encode_preset=p.get("encode_preset", "medium")))
    _sync_json_route(
        "/vrgdg/music_builder/post_process/preview_film_grain",
        lambda p: api.preview_film_grain_on_media(
            p.get("input"), float(p.get("grain_intensity", 0.04)),
            float(p.get("saturation_mix", 0.5)), p.get("seed"),
            base=base_folder))
    _sync_json_route(
        "/vrgdg/music_builder/post_process/apply_adjust_image",
        lambda p: api.apply_adjust_to_image(
            p.get("input"), p.get("output", ""), p.get("settings"),
            replace_source=bool(p.get("replace_source"))))
    _sync_json_route(
        "/vrgdg/music_builder/post_process/apply_adjust_video",
        lambda p: api.apply_adjust_to_video(
            p.get("input"), p.get("output", ""), p.get("settings"),
            batch_size=int(p.get("batch_size", 8)),
            replace_source=bool(p.get("replace_source")),
            preserve_audio=bool(p.get("preserve_audio", True)),
            encode_crf=p.get("encode_crf", 23),
            encode_preset=p.get("encode_preset", "medium")))
    _sync_json_route(
        "/vrgdg/music_builder/post_process/preview_adjust",
        lambda p: api.preview_adjust_on_media(
            p.get("input"), p.get("settings"), base=base_folder))
    _sync_json_route(
        "/vrgdg/music_builder/post_process/grade_video",
        lambda p: api.grade_video(
            p.get("input"), p.get("output", ""),
            lut_name=p.get("lut"), lut_strength=float(p.get("strength", 10.0)),
            adjust=p.get("adjust"), reference_image=p.get("reference_image"),
            match_strength=float(p.get("match_strength", 1.0)),
            sharpen_strength=float(p.get("sharpen_strength", 0.0)),
            grain_intensity=float(p.get("grain_intensity", 0.0)),
            saturation_mix=float(p.get("saturation_mix", 0.5)),
            seed=int(p.get("seed", 0)),
            batch_size=int(p.get("batch_size", 8)),
            preserve_audio=bool(p.get("preserve_audio", True)),
            luts_dir=luts_dir,
            fused_mode=str(p.get("fused_mode", "xla"))))
    _sync_json_route(
        "/vrgdg/music_builder/post_process/delete_preview",
        lambda p: {"deleted": api.delete_preview(p.get("path"),
                                                 base=base_folder)})
    # the reference exposes the same delete under the luts/ prefix too
    # (VRGDG_LUTVideoTools.py:1612-1619) — keep both paths answering
    _sync_json_route(
        "/vrgdg/music_builder/luts/delete_preview",
        lambda p: {"deleted": api.delete_preview(p.get("path"),
                                                 base=base_folder)})

    @routes.get("/vrgdg/music_builder/post_process/adjust_presets")
    @_handler
    def presets_list(request):
        return _ok(presets=api.list_adjust_presets(base=base_folder))

    _sync_json_route(
        "/vrgdg/music_builder/post_process/save_adjust_preset",
        lambda p: api.save_adjust_preset(p.get("name"), p.get("settings"),
                                         base=base_folder))
    _sync_json_route(
        "/vrgdg/music_builder/post_process/import_adjust_preset",
        lambda p: api.import_adjust_preset(p.get("path"), base=base_folder))
    _sync_json_route(
        "/vrgdg/music_builder/post_process/delete_adjust_preset",
        lambda p: {"deleted": api.delete_adjust_preset(p.get("name"),
                                                       base=base_folder)})

    # ---------------- silent audio ----------------
    # Silence generator (VRGDG_SilentAudioRoutes.py:98-104); the peak
    # envelope comes from the stdlib-based reader in runtime/audio.

    @routes.post("/vrgdg/music_builder/create_silent_audio")
    @_handler
    async def create_silent_audio(request):
        from ..runtime import audio

        payload = await _json(request)
        loop = asyncio.get_running_loop()
        result = await loop.run_in_executor(
            None, lambda: audio.create_silent_audio(payload))
        return _ok(**result)

    # ---------------- beats + audio toolkit ----------------
    # Beat analysis / scene durations (GeneralVideoNodes.py:2160-2753) and
    # the waveform splitters (nodes.py:426-964, GeneralVideoNodes2.py).

    def _beats_analyze(payload):
        from ..runtime import audio_toolkit as at
        from ..runtime import beats as beats_rt

        stems = {name: at.load_audio(payload[key])
                 for name, key in (("drums", "drums_path"),
                                   ("bass", "bass_path"),
                                   ("vocals", "vocals_path"),
                                   ("other", "other_path"))
                 if payload.get(key)}
        return beats_rt.analyze_beats(
            at.load_audio(payload["mix_path"]), **stems)

    def _beats_scene_srt(payload):
        from ..runtime import beats as beats_rt

        return beats_rt.generate_scene_srt(
            payload.get("beat_data"),
            float(payload.get("min_duration", 2.0)),
            float(payload.get("max_duration", 10.0)),
            float(payload.get("bias", 0.7)),
            str(payload.get("duration_preset", "impact_weighted")),
            int(payload.get("seed", 0)),
            output_path=payload.get("output_path") or None)

    def _audio_peaks(payload):
        from ..runtime import audio as audio_rt

        return audio_rt.read_audio_peaks(
            payload["path"], int(payload.get("target_peaks", 600)))

    _sync_json_route("/vrgdg/music_builder/beats/analyze",
                     lambda p: _beats_analyze(p))
    _sync_json_route("/vrgdg/music_builder/beats/scene_srt",
                     lambda p: _beats_scene_srt(p))
    _sync_json_route("/vrgdg/music_builder/audio/peaks",
                     lambda p: _audio_peaks(p))

    # ---------------- music video builder project store ----------------
    # Non-LLM builder backend (VRGDG_MusicVideoBuilderNodes.py:9793-10212):
    # project lifecycle, session persistence, scene media/audio, timeline
    # mix, ZIP export/import. Handlers live in vrgdg_tpu.api.builder;
    # responses are flat {"ok": true, **result} like the reference's.
    # Excluded by design: LLM prompt generation, native file pickers, and
    # desktop open-file actions (docs/MIGRATION.md lists each).

    from ..api import builder as mvb

    _out_root = os.path.abspath(base_folder or paths.DEFAULT_OUTPUT_ROOT)

    def _post_json_routes(prefix):
        """Route factory: JSON body -> executor -> flat {"ok", **result}
        responses (the reference's handler shape) under one prefix."""

        def register(route_path, fn):
            @routes.post(prefix + route_path)
            @_handler
            async def handler(request, _fn=fn):
                payload = await _json(request)
                loop = asyncio.get_running_loop()
                result = await loop.run_in_executor(
                    None, lambda: _fn(payload))
                return _ok(**result)

        return register

    _builder_route = _post_json_routes("/vrgdg/music_builder/")

    _builder_route("analyze_audio",
                   lambda p: mvb.analyze_audio(p, _out_root))
    _builder_route("import_capcut_beats",
                   lambda p: mvb.find_latest_capcut_beats(
                       p.get("audio_duration", 0)))
    _builder_route("save_session",
                   lambda p: mvb.save_session(p, _out_root))
    _builder_route("save_render_log", mvb.save_render_log)
    _builder_route("save_wizard_draft", mvb.save_wizard_draft)
    _builder_route("load_wizard_draft", mvb.load_wizard_draft)
    _builder_route("new_project",
                   lambda p: mvb.new_project(p, _out_root))
    _builder_route("save_project_as",
                   lambda p: mvb.save_project_as(p, _out_root))
    _builder_route("save_scene_image", mvb.save_scene_image)
    _builder_route("delete_project_media", mvb.delete_media)
    _builder_route("archive_scene_image", mvb.archive_scene_image)
    _builder_route("extract_video_final_frame", mvb.extract_final_frame)
    _builder_route("save_flux_reference_image", mvb.save_reference_image)
    _builder_route("import_reference_subjects",
                   lambda p: mvb.import_reference_cards(p, "subject"))
    _builder_route("import_reference_locations",
                   lambda p: mvb.import_reference_cards(p, "location"))
    _builder_route("save_scene_audio", mvb.save_scene_audio)
    _builder_route("save_project_audio", mvb.save_project_audio)
    _builder_route("save_project_srt", mvb.save_project_srt)
    _builder_route("save_single_scene_srt", mvb.save_scene_srt)
    _builder_route("trim_scene_audio", mvb.trim_scene_audio)
    _builder_route("prepare_scene_audio_mix", mvb.mix_scene_audio)
    _builder_route("load_session",
                   lambda p: mvb.load_session(p.get("project_folder")))
    _builder_route("delete_project",
                   lambda p: mvb.delete_project(p, _out_root))
    _builder_route("scan_scene_videos",
                   lambda p: mvb.scan_scene_videos(
                       p.get("project_folder")))
    _builder_route("restore_scene_video", mvb.restore_scene_video)
    _builder_route("load_srt",
                   lambda p: mvb.load_srt(p.get("path")
                                          or p.get("srt_path")))
    _builder_route("load_prompt_json",
                   lambda p: mvb.load_prompt_json(p.get("path")))
    _builder_route("project_prompt_creator_paths",
                   lambda p: mvb.prompt_creator_paths(
                       p.get("project_folder")))
    _builder_route("import_latest_prompt_creator_outputs",
                   lambda p: mvb.copy_prompt_creator_outputs(
                       p.get("project_folder"), "", _out_root))
    _builder_route("copy_prompt_creator_outputs",
                   lambda p: mvb.copy_prompt_creator_outputs(
                       p.get("project_folder"),
                       p.get("source_project_folder", ""), _out_root))

    # LLM-instruction store (defaults/overrides/presets; the LLM
    # drivers themselves stay excluded — api/instructions.py docstring)
    from ..api import instructions as instr

    _builder_route("get_instruction", instr.get_instruction)
    _builder_route("save_instruction", instr.save_instruction)
    _builder_route("reset_instruction", instr.reset_instruction)
    _builder_route("list_instruction_presets",
                   lambda p: instr.list_presets(p, _out_root))
    _builder_route("save_instruction_preset",
                   lambda p: instr.save_preset(p, _out_root))
    _builder_route("load_instruction_preset",
                   lambda p: instr.load_preset(p, _out_root))

    @routes.get("/vrgdg/music_builder/instruction_keys")
    @_handler
    def builder_instruction_keys(request):
        # standalone convenience: the reference embeds this table in its
        # web JS; the panel populates its key dropdown from here
        return _ok(keys=[{"key": key, "label": entry["label"],
                          "preset_group": instr.preset_group(key),
                          "preset_group_label":
                              instr.preset_group_label(key)}
                         for key, entry in instr.REGISTRY.items()])

    @routes.get("/vrgdg/music_builder/list_projects")
    @_handler
    def builder_list_projects(request):
        return _ok(**mvb.list_projects(
            _out_root, str(request.query.get("project_root") or "")))

    @routes.get("/vrgdg/music_builder/model_defaults")
    @_handler
    def builder_model_defaults(request):
        return _ok(**mvb.load_model_defaults(_out_root))

    @routes.get("/vrgdg/music_builder/default_context_paths")
    @_handler
    def builder_default_context_paths(request):
        return _ok(**mvb.default_context_paths(_out_root))

    @routes.get("/vrgdg/music_builder/default_audio_srt_paths")
    @_handler
    def builder_default_audio_srt_paths(request):
        return _ok(**mvb.default_audio_srt_paths(_out_root))

    @routes.get("/vrgdg/music_builder/audio")
    @_handler
    def builder_audio(request):
        path = os.path.normpath(os.path.abspath(
            str(request.query.get("path") or "").strip()))
        # reference serves any path (:10212-10218); standalone, only
        # audio under the managed output root is exposed
        if not paths._inside(_out_root, path) or not os.path.isfile(path):
            raise FileNotFoundError("Audio file was not found.")
        if os.path.splitext(path)[1].lower() not in mvb.AUDIO_EXTENSIONS:
            raise ValueError("Unsupported audio type.")
        return web.FileResponse(path)

    @routes.get("/vrgdg/music_builder/export_project")
    @_handler
    async def builder_export_project(request):
        loop = asyncio.get_running_loop()
        zip_path, download_name = await loop.run_in_executor(
            None, mvb.export_project,
            request.query.get("project_folder", ""))
        response = web.StreamResponse(status=200, headers={
            "Content-Type": "application/zip",
            "Content-Disposition":
                f'attachment; filename="{download_name}"',
            "Content-Length": str(os.path.getsize(zip_path)),
            "Cache-Control": "no-store"})
        try:
            await response.prepare(request)
            with open(zip_path, "rb") as handle:
                while True:
                    chunk = await loop.run_in_executor(
                        None, handle.read, 1 << 20)
                    if not chunk:
                        break
                    await response.write(chunk)
            await response.write_eof()
            return response
        finally:
            try:
                os.remove(zip_path)
            except OSError:
                pass

    @routes.post("/vrgdg/music_builder/import_project")
    @_handler
    async def builder_import_project(request):
        import tempfile

        reader = await request.multipart()
        requested_name, temp_path = "", ""
        try:
            async for part in reader:
                if part.name == "project_name":
                    requested_name = (await part.text()).strip()
                elif part.name == "project_zip":
                    handle = tempfile.NamedTemporaryFile(
                        prefix="vrgdg_builder_import_", suffix=".zip",
                        delete=False)
                    temp_path = handle.name
                    try:
                        await _drain_part(part, handle.write)
                    finally:
                        handle.close()
            if not temp_path or not os.path.isfile(temp_path):
                raise ValueError(
                    "Choose a .vrgdg.zip project package to import.")
            loop = asyncio.get_running_loop()
            result = await loop.run_in_executor(
                None, mvb.import_project, temp_path, requested_name,
                _out_root)
            return _ok(**result)
        finally:
            if temp_path:
                try:
                    os.remove(temp_path)
                except OSError:
                    pass

    # ---------------- lyrics + LLM batch pipeline ----------------
    # HTTP surface over the HuMo text pipelines: timestamped lyric
    # scenes / lyric sheets on external ASR word JSON
    # (HumoAutomationExtra2.py:2122-3145, 1842-2042) and the LLM batch
    # plan/save/combine/split loop (HumoAutomationExtra1.py:939-1595).
    # The ASR and LLM model runs themselves stay external.

    from ..runtime import llm_batches as lbx
    from ..runtime import lyric_align as lal

    _llm_root = os.path.join(_out_root, "llm_batches")

    def _contained_batch_folder(folder):
        real = os.path.realpath(str(folder or ""))
        root = os.path.realpath(_llm_root)
        if real != root and not real.startswith(root + os.sep):
            raise ValueError(
                "folder must live under the managed llm_batches root")
        return real

    def _lyrics_timestamped(payload):
        segments = lal.segments_from_words(
            payload.get("segments") or [])
        duration = float(payload.get("duration") or 0.0)
        if duration <= 0:
            duration = max((seg["end"] for seg in segments),
                           default=0.0)
        return lal.timestamped_lyrics(
            segments, duration,
            reference_lyrics=payload.get("reference_lyrics", ""),
            segment_mode=payload.get("segment_mode",
                                     "whisper_chunks"),
            include_instrumental_gaps=bool(
                payload.get("include_instrumental_gaps", True)),
            instrumental_text=payload.get("instrumental_text",
                                          "[instrumental]"),
            min_gap_seconds=float(payload.get("min_gap_seconds",
                                              1.0)),
            min_scene_seconds=float(payload.get("min_scene_seconds",
                                                1.0)),
            max_scene_seconds=float(payload.get("max_scene_seconds",
                                                8.0)),
            vocal_tail_padding_seconds=float(
                payload.get("vocal_tail_padding_seconds", 0.6)))

    def _lyrics_sheet(payload):
        segments = lal.segments_from_words(
            payload.get("segments") or [])
        if payload.get("srt_text"):
            windows = lal.srt_windows(payload["srt_text"])
        else:
            windows = [tuple(window)
                       for window in payload.get("windows", [])]
        backup = lal.segments_from_words(payload["backup_segments"]) \
            if payload.get("backup_segments") else None
        out = lal.extract_window_lyrics(
            segments, windows,
            reference_lyrics=payload.get("reference_lyrics", ""),
            backup_segments=backup,
            native_align=bool(payload.get("native_align")),
            strict_reference_text=bool(
                payload.get("strict_reference_text", True)),
            fill_aggressiveness=int(
                payload.get("fill_aggressiveness", 1)),
            preserve_nonvocal_segments=bool(
                payload.get("preserve_nonvocal_segments", True)),
            alignment_min_words=int(
                payload.get("alignment_min_words", 2)))
        return {"sheet": out["sheet"], "texts": out["texts"],
                "windows": [list(window)
                            for window in out["windows"]]}

    _lyrics_route = _post_json_routes("/vrgdg/lyrics/")
    _lyrics_route("timestamped", _lyrics_timestamped)
    _lyrics_route("sheet", _lyrics_sheet)

    def _llm_batch_plan(payload):
        return lbx.plan_batch(
            _llm_root, payload.get("story_groups"),
            payload.get("story_summary", ""),
            batch_size=int(payload.get("batch_size", 10)),
            file_prefix=payload.get("file_prefix", "Scene"),
            manual_index=int(payload.get("manual_index", -1)),
            lyric_segments=payload.get("lyric_segments"))

    def _llm_batch_save(payload):
        folder = _contained_batch_folder(payload.get("folder"))
        return {"path": lbx.save_batch(
            folder, payload.get("file_prefix", "Scene"),
            int(payload["batch_index"]),
            str(payload.get("text", "")))}

    def _llm_batch_combine(payload):
        folder = _contained_batch_folder(payload.get("folder"))
        result = lbx.combine_batches(
            folder, payload.get("file_prefix", "Scene"))
        return {key: result[key] for key in
                ("combined", "text", "path", "files", "count")}

    _llm_route = _post_json_routes("/vrgdg/llm_batches/")
    _llm_route("plan", _llm_batch_plan)
    _llm_route("save", _llm_batch_save)
    _llm_route("combine", _llm_batch_combine)
    _llm_route("split",
               lambda p: lbx.split_prompt_json(
                   p.get("text", ""), folder=None,
                   index=int(p.get("index", 0))))

    # combined-file browsing + remake prompt editing over the batches
    # the loop above writes (VRGDG_GeneralNodes.py:447-601; helpers in
    # runtime/combined_files.py, oracle-fuzzed)
    from ..runtime import combined_files as cbf

    @routes.get("/vrgdg/llm_batches/combined_files")
    @_handler
    def llm_combined_files(request):
        return _ok(**cbf.combined_files_state(
            _llm_root, request.query.get("batch_type", ""),
            request.query.get("combined_json_file", "")))

    @routes.get("/vrgdg/llm_batches/combined_file_prompt_values")
    @_handler
    def llm_combined_prompt_values(request):
        return _ok(**cbf.combined_file_prompt_values(
            _llm_root, request.query.get("batch_type", ""),
            request.query.get("combined_json_file", "")))

    _llm_route("combined_file_update_prompts",
               lambda p: cbf.update_combined_file_prompts(_llm_root, p))
    _llm_route("remake_prompt_indexes",
               lambda p: cbf.remake_prompt_state(p.get("folder_path", "")))

    # ---------------- storyboard ----------------
    # Storyboard state persistence (VRGDG_StoryboardBuilderNodes.py:
    # 2910-2944); the gemma_*/story_*/dialogue generation routes are LLM
    # surface and stay excluded.

    from ..api import storyboard as sbd

    _storyboard_route = _post_json_routes("/vrgdg/storyboard/")

    _storyboard_route("load",
                      lambda p: {"storyboard": sbd.load_storyboard(p)})
    _storyboard_route("save",
                      lambda p: {"storyboard": sbd.save_storyboard(p)})
    _storyboard_route("import_reference_image",
                      sbd.import_reference_image)
    _storyboard_route("export_prompts", sbd.export_prompts)

    # ---------------- text/audio file libraries ----------------
    # Shared text-file browser (VRGDG_GeneralNodes.py:1871-1913),
    # editable text files (VRGDG_MusicVideoBuilderNodes.py:2666-2694),
    # audio library (VRGDG_AudioNodes.py:514-560), and the Step-1/2
    # ConceptPrompts handoff (VRGDG_GeneralNodes2.py:1220-1250).

    from ..api import text_files as tfl

    _builder_route("load_text_file", tfl.load_text_file)
    _builder_route("save_text_file", tfl.save_text_file)

    @routes.get("/vrgdg/text_files/list")
    @_handler
    def text_files_list(request):
        return _ok(**tfl.list_category(
            request.query.get("category"), _out_root))

    @routes.get("/vrgdg/text_files/folders")
    @_handler
    def text_files_folders(request):
        return _ok(**tfl.list_folders(_out_root))

    @routes.get("/vrgdg/text_files/files")
    @_handler
    def text_files_for_folder(request):
        def truthy(key):
            return str(request.query.get(key, "")).strip().lower() \
                in ("1", "true", "yes", "on")

        return _ok(**tfl.list_folder_files(
            request.query.get("folder", ""),
            use_most_recent=truthy("use_most_recent"),
            custom_base_path=(request.query.get("custom_base_path", "")
                              if truthy("use_custom_base_path")
                              else ""),
            output_root=_out_root))

    # advanced savers (VRGDG_SaveTextAdvanced{,Concat} — node-only in the
    # reference, natural POST surface here)
    _sync_json_route("/vrgdg/text_files/save_advanced",
                     lambda p: tfl.save_text_advanced(p, _out_root))
    _sync_json_route("/vrgdg/text_files/save_concat",
                     lambda p: tfl.save_text_concat(p, _out_root))

    @routes.get("/vrgdg/audio/list")
    @_handler
    def audio_list(request):
        return _ok(**tfl.list_audio(_out_root))

    @routes.post("/vrgdg/audio/upload")
    @_handler
    async def audio_upload(request):
        reader = await request.multipart()
        filename, overwrite, chunks = "", False, []
        async for part in reader:
            if part.name == "overwrite":
                overwrite = (await part.text()).strip().lower() \
                    in ("1", "true", "yes", "on")
            elif part.name == "audio":
                filename = part.filename or ""
                await _drain_part(part, chunks.append)
        if not filename:
            raise ValueError("Missing audio file.")
        loop = asyncio.get_running_loop()
        result = await loop.run_in_executor(
            None, tfl.save_audio_upload, filename, b"".join(chunks),
            overwrite, _out_root)
        return _ok(**result)

    @routes.get("/vrgdg/part2/load_concept_prompts")
    @_handler
    def part2_concept_prompts(request):
        return _ok(**tfl.load_shared_concept_prompts(_out_root))

    # quick-input popup (VRGDG_GeneralNodes2.py:1205-1310): fixed text
    # targets the HuMo automation reads back + a single-slot audio drop
    @routes.get("/vrgdg/test_popup/config")
    @_handler
    def popup_config(request):
        return _ok(**tfl.popup_config(_out_root))

    _post_json_routes("/vrgdg/test_popup/")(
        "save_text", lambda p: tfl.popup_save_text(p, _out_root))

    @routes.post("/vrgdg/test_popup/upload_audio")
    @_handler
    async def popup_upload_audio(request):
        reader = await request.multipart()
        filename, chunks = "", []
        async for part in reader:
            if part.name == "audio":
                filename = part.filename or ""
                await _drain_part(part, chunks.append)
        if not filename:
            raise ValueError("Missing audio file.")
        loop = asyncio.get_running_loop()
        result = await loop.run_in_executor(
            None, tfl.popup_upload_audio, filename, b"".join(chunks),
            _out_root)
        return _ok(**result)

    # ---------------- prompt creator ----------------
    # Draft/output persistence the Video Builder imports from
    # (VRGDG_MusicVideoPromptCreatorNodes.py:1951-2079); the Gemma
    # generation + instruction routes are LLM surface and stay excluded.

    from ..api import prompt_creator as pcr

    _pc_route = _post_json_routes("/vrgdg/music_prompt_creator/")

    _pc_route("save_outputs",
              lambda p: pcr.save_outputs(p, _out_root))
    _pc_route("save_draft", lambda p: pcr.save_draft(p, _out_root))
    _pc_route("load_draft", lambda p: pcr.load_draft(p, _out_root))

    @routes.get("/vrgdg/music_prompt_creator/list_drafts")
    @_handler
    def pc_list_drafts(request):
        return _ok(**pcr.list_drafts(_out_root))

    # instruction store (defaults/overrides/presets — the Gemma drivers
    # that consume the text stay excluded; api/pc_instructions.py) and
    # the deterministic hidden-Whisper workflow builder
    from ..api import pc_instructions as pci

    _pc_route("get_instruction",
              lambda p: pci.get_instruction(p, _out_root))
    _pc_route("save_instruction",
              lambda p: pci.save_instruction(p, _out_root))
    _pc_route("reset_instruction",
              lambda p: pci.reset_instruction(p, _out_root))
    _pc_route("list_instruction_presets",
              lambda p: pci.list_presets(p, _out_root))
    _pc_route("save_instruction_preset",
              lambda p: pci.save_preset(p, _out_root))
    _pc_route("load_instruction_preset",
              lambda p: pci.load_preset(p, _out_root))
    _pc_route("build_whisper_prompt",
              lambda p: pcr.build_whisper_prompt(p, _out_root))

    @routes.get("/vrgdg/music_prompt_creator/config")
    @_handler
    def pc_config(request):
        return _ok(**pcr.config(_out_root))

    @routes.post("/vrgdg/music_prompt_creator/import_audio")
    @_handler
    async def pc_import_audio(request):
        reader = await request.multipart()
        project_folder, audio_name, chunks = "", "", []
        async for part in reader:
            if part.name == "project_folder":
                project_folder = (await part.text()).strip()
            elif part.name == "audio":
                audio_name = part.filename or "prompt_creator_audio.wav"
                await _drain_part(part, chunks.append)
                break
        loop = asyncio.get_running_loop()
        result = await loop.run_in_executor(
            None, pcr.import_audio, project_folder, audio_name,
            b"".join(chunks), _out_root)
        return _ok(**result)

    # ---------------- start-image storyboard ----------------
    # Per-scene start/end frame board inside a builder project
    # (VRGDG_StartImageStoryboard.py:541-642). The Browser-AI download
    # watcher behind import_latest is generalized to a watch folder /
    # explicit source_path (browser automation is out of scope).

    from ..api import start_storyboard as ssb

    _ssb_post = _post_json_routes("/vrgdg/start_storyboard/")

    def _ssb_route(route_path, fn):
        # folder validation stats the disk — keep it in the executor
        _ssb_post(route_path, lambda p, _fn=fn: _fn(
            ssb.project_folder(p.get("project_folder")), p))

    _ssb_route("load",
               lambda f, p: {"storyboard": ssb.load_board(f)})
    _ssb_route("reimport",
               lambda f, p: {"storyboard": ssb.reimport_board(f)})

    def _ssb_save(folder, payload):
        ssb.save_board(folder, payload.get("storyboard") or {})
        return {"storyboard": ssb.load_board(folder)}

    _ssb_route("save", _ssb_save)
    _ssb_route("import_latest",
               lambda f, p: ssb.import_latest(
                   f, p.get("scene_number"), p.get("frame", "start"),
                   source_path=p.get("source_path", ""),
                   downloads_folder=p.get("downloads_folder")))
    _ssb_route("import_project_start_frames",
               lambda f, p: ssb.import_project_start_frames(
                   f, bool(p.get("overwrite"))))

    def _ssb_save_reference(folder, payload):
        result = ssb.save_reference(folder, payload.get("image_data"),
                                    payload.get("scene_number"))
        result["storyboard"] = ssb.load_board(folder)
        return result

    _ssb_route("save_reference", _ssb_save_reference)
    _ssb_route("save_scene_upload",
               lambda f, p: ssb.save_scene_upload(
                   f, p.get("image_data"), p.get("scene_number"),
                   p.get("frame", "start")))

    @routes.get("/vrgdg/start_storyboard/image")
    @_handler
    def ssb_image(request):
        folder = ssb.project_folder(
            request.query.get("project_folder"))
        path = os.path.abspath(
            str(request.query.get("path") or "").strip())
        if not os.path.isfile(path) or not any(
                paths._inside(root, path)
                for root in ssb.image_roots(folder)):
            raise FileNotFoundError(
                "Storyboard image was not found.")
        return web.FileResponse(path)

    # ---------------- video editor ----------------
    # Timeline-editor backend (VRGDG_VideoEditorNodes.py:679-783) minus
    # the two Gemma prompt-generation routes (LLM, out of scope). The
    # remake queue is exposed as a route the reference drives through a
    # ComfyUI node (VRGDG_RemakeClipQueue) — callers loop /remake/next
    # until is_valid goes false.

    from ..api import video_editor as ved

    _editor_roots = (_out_root,)

    _editor_route = _post_json_routes("/vrgdg/video_editor/")

    _editor_route("list_clips",
                  lambda p: ved.list_clips(p.get("folder_path"),
                                           p.get("extensions", ""),
                                           _editor_roots))
    _editor_route("load_session",
                  lambda p: {"session": ved.load_session(
                      p.get("folder_path"), _editor_roots)})
    _editor_route("save_session",
                  lambda p: ved.save_session(p.get("folder_path"),
                                             p.get("session"),
                                             _editor_roots))
    _editor_route("save_frame",
                  lambda p: ved.save_frame(p, _editor_roots))
    _editor_route("load_clip",
                  lambda p: ved.load_clip(
                      p.get("session_path"),
                      int(p.get("clip_number", 1) or 1),
                      p.get("clip_path", "")))

    def _remake_next(p):
        result = ved.next_remake(
            p.get("session_path"), p.get("srt_file"),
            p.get("audio_path") or p.get("audio"),
            queue_index=int(p.get("queue_index", 0) or 0),
            fps=int(p.get("fps", 24) or 24),
            tail_loss_frames=(5 if p.get("tail_loss_frames", 5) is None
                              else int(p.get("tail_loss_frames", 5))),
            pre_frames=int(p.get("pre_frames", 0) or 0))
        audio = result.pop("audio", None)
        if audio is not None and p.get("audio_output"):
            from ..runtime import audio_toolkit as at

            result["audio_path"] = at.save_wav(
                str(p["audio_output"]), audio)
        return result

    _editor_route("remake/next", _remake_next)

    def _editor_media(request, allowed):
        path = os.path.normpath(os.path.abspath(
            str(request.query.get("path") or "").strip()))
        # list_clips accepts arbitrary absolute folders (reference
        # parity), so the URLs it emits must be servable: allow the
        # managed root OR any folder the editor actually manages (one
        # holding vrgdg_temp/editor_session.json at, or one level
        # above, the file's directory — covering remake/ and
        # vrgdg_editor_frames/ children).
        if not paths._inside(_out_root, path) \
                and not ved.is_editor_media(path):
            raise FileNotFoundError("Media file was not found.")
        if not os.path.isfile(path):
            raise FileNotFoundError("Media file was not found.")
        if os.path.splitext(path)[1].lower() not in allowed:
            raise ValueError("Unsupported media type.")
        return web.FileResponse(path)

    @routes.get("/vrgdg/video_editor/video")
    @_handler
    def editor_video(request):
        return _editor_media(request, set(ved.VIDEO_EXTENSIONS))

    @routes.get("/vrgdg/video_editor/image")
    @_handler
    def editor_image(request):
        return _editor_media(request,
                             {".png", ".jpg", ".jpeg", ".webp"})

    # ---------------- compare ----------------
    # The reference renders these five modes in a browser widget
    # (VRGDG_ImageCompareNode.py:11-14); standalone they render to media.
    # Default outputs land under the served enhancer root so the web UI
    # can play them back through the media route.

    def _compare_output(payload, ext):
        given = str(payload.get("output") or "").strip()
        if given:
            return given
        return os.path.join(
            enh.root_folder(base_folder),
            f"compare_{payload.get('mode', 'slider')}_"
            f"{int(time.time() * 1000)}{ext}")

    _sync_json_route(
        "/vrgdg/compare/image",
        lambda p: api.compare_images(
            p.get("input_a"), p.get("input_b"), p.get("mode", "slider"),
            _compare_output(p, ".png"),
            slider_position=float(p.get("slider_position", 0.5)),
            overlay_opacity=float(p.get("overlay_opacity", 0.5)),
            difference_gain=float(p.get("difference_gain", 1.0))))
    _sync_json_route(
        "/vrgdg/compare/video",
        lambda p: api.compare_videos(
            p.get("input_a"), p.get("input_b"), p.get("mode", "slider"),
            _compare_output(p, ".mp4"),
            slider_position=float(p.get("slider_position", 0.5)),
            overlay_opacity=float(p.get("overlay_opacity", 0.5)),
            difference_gain=float(p.get("difference_gain", 1.0)),
            blink_speed=float(p.get("blink_speed", 1.0)),
            batch_size=int(p.get("batch_size", 8))))

    def _compare_grid(payload):
        # labeled comparison grid (LTXLoraTrain.py:7926-8316) over
        # explicit paths or a folder of renders
        folder = str(payload.get("folder") or "").strip()
        sources = video_io.find_grid_videos(folder) if folder \
            else [str(path) for path in payload.get("paths", [])]
        frames = video_io.render_video_grid(
            sources, labels=payload.get("labels"),
            cell_width=int(payload.get("cell_width", 0)),
            cell_height=int(payload.get("cell_height", 0)),
            label_tiles=bool(payload.get("label_tiles", True)))
        output = str(payload.get("output") or "").strip() or \
            os.path.join(enh.root_folder(base_folder),
                         f"compare_grid_{int(time.time() * 1000)}.mp4")
        fps = float(payload.get("fps", 24.0))
        writer = video_io.VideoWriter(output, fps, frames.shape[2],
                                      frames.shape[1])
        try:
            for frame in video_io.array_to_frames(frames):
                writer.write_bgr(frame)
        finally:
            writer.close()
        return {"output": os.path.abspath(output),
                "frames": int(frames.shape[0]),
                "tiles": len(sources), "fps": fps}

    _sync_json_route("/vrgdg/compare/grid", _compare_grid)

    # ---------------- face fix ----------------
    # Route surface parity: /root/reference/VRGDG_FaceFix.py:1029-1104.
    # Responses are flat {"ok": true, **result} like the reference's.

    from ..jobs import face_fix as ff

    def _face_fix_route(route_path, fn):
        @routes.post(route_path)
        @_handler
        async def handler(request, _fn=fn):
            payload = await _json(request)
            loop = asyncio.get_running_loop()
            result = await loop.run_in_executor(None, lambda: _fn(payload))
            return _ok(**result)

    _face_fix_route("/vrgdg/face_fix/prepare", ff.prepare_face_fix)
    _face_fix_route("/vrgdg/face_fix/estimate_anchors", ff.estimate_anchors)
    _face_fix_route("/vrgdg/face_fix/accept_enhanced",
                    ff.accept_enhanced_crop)
    _face_fix_route("/vrgdg/face_fix/accept_enhanced_anchor",
                    ff.accept_enhanced_anchor)
    # the reference names this build_ltx_prompt; both names serve the same
    # contract here (the ComfyUI workflow-JSON patching is out of scope)
    _face_fix_route("/vrgdg/face_fix/build_ltx_prompt", ff.build_ltx_inputs)
    _face_fix_route("/vrgdg/face_fix/build_ltx_inputs", ff.build_ltx_inputs)
    _face_fix_route("/vrgdg/face_fix/accept_ltx_frames",
                    ff.accept_ltx_frames)
    _face_fix_route("/vrgdg/face_fix/finalize", ff.finalize_face_fix)

    # ---------------- LoRA dataset pair store ----------------
    # Non-LLM slice of /root/reference/VRGDG_LoraDatasetCreatorNodes.py
    # (:262-338): pair writers + manifest. LLM captioning and desktop
    # folder pickers stay out of scope.

    from ..api import lora_dataset as lds

    def _flat_json_route(route_path, fn):
        # reference-style flat {"ok": true, **result} responses
        @routes.post(route_path)
        @_handler
        async def handler(request, _fn=fn):
            payload = await _json(request)
            loop = asyncio.get_running_loop()
            result = await loop.run_in_executor(None, lambda: _fn(payload))
            return _ok(**result)

    _flat_json_route("/vrgdg/lora_dataset/save_pair", lds.save_pair)
    _flat_json_route("/vrgdg/lora_dataset/save_ic_pair", lds.save_ic_pair)
    _flat_json_route("/vrgdg/lora_dataset/list", lds.list_dataset)

    # ---------------- Krea2 LoRA Studio ----------------
    # Deterministic layer of /root/reference/LTXLoraTrain.py:1235-2430:
    # project/dataset store, imports, samples, XYZ grid, progress parse,
    # and run *plans* — the musubi/AI-Toolkit execution and LLM
    # captioning stay external (api/krea2_studio.py docstring).

    from ..api import krea2_studio as k2s

    @routes.get("/vrgdg/krea2_studio/defaults")
    @_handler
    def k2s_defaults(request):
        return _ok(**k2s.defaults(output_root=_out_root))

    _flat_json_route("/vrgdg/krea2_studio/create_project",
                     lambda p: k2s.create_project(p, _out_root))
    _flat_json_route("/vrgdg/krea2_studio/load_project", k2s.load_project)
    _flat_json_route("/vrgdg/krea2_studio/list_projects",
                     lambda p: k2s.list_projects(p, _out_root))
    _flat_json_route("/vrgdg/krea2_studio/save_project", k2s.save_project)
    _flat_json_route("/vrgdg/krea2_studio/training_progress",
                     lambda p: k2s.training_progress(
                         p.get("project_dir", "")))
    _flat_json_route("/vrgdg/krea2_studio/build_sample_prompt",
                     k2s.build_sample_prompt)
    _flat_json_route("/vrgdg/krea2_studio/save_sample",
                     lambda p: k2s.save_sample(p, _out_root))
    _flat_json_route("/vrgdg/krea2_studio/create_xyz", k2s.create_xyz)
    _flat_json_route("/vrgdg/krea2_studio/train_plan", k2s.train_plan)
    _flat_json_route("/vrgdg/krea2_studio/record_training_result",
                     k2s.record_training_result)

    @routes.post("/vrgdg/krea2_studio/build_clear_memory_prompt")
    @_handler
    async def k2s_clear_memory_prompt(request):
        # LTXLoraTrain.py:1931-1939 — the template verbatim
        path, prompt = workflow_runner.load_api_template("clear_memory")
        return _ok(workflow_path=path, prompt=prompt)

    async def _k2s_import(request):
        reader = await request.multipart()
        project_dir, role, uploads = "", "", []
        async for part in reader:
            if part.name == "project_dir":
                project_dir = (await part.text()).strip()
            elif part.name == "role":
                role = (await part.text()).strip()
            elif part.filename:
                chunks = []
                await _drain_part(part, chunks.append)
                uploads.append((part.filename, b"".join(chunks)))
        return project_dir, role, uploads

    @routes.post("/vrgdg/krea2_studio/import_files")
    @_handler
    async def k2s_import_files(request):
        project_dir, _role, uploads = await _k2s_import(request)
        loop = asyncio.get_running_loop()
        return _ok(**await loop.run_in_executor(
            None, k2s.import_files, project_dir, uploads))

    @routes.post("/vrgdg/krea2_studio/import_edit_files")
    @_handler
    async def k2s_import_edit_files(request):
        project_dir, role, uploads = await _k2s_import(request)
        loop = asyncio.get_running_loop()
        return _ok(**await loop.run_in_executor(
            None, k2s.import_edit_files, project_dir, role, uploads))

    @routes.get("/vrgdg/krea2_studio/file")
    @_handler
    def k2s_file(request):
        path = os.path.normpath(os.path.abspath(
            str(request.query.get("path") or "").strip()))
        # the reference serves any image path (LTXLoraTrain.py:2405-2410);
        # standalone, contain to the managed output root like /media
        root = os.path.abspath(_out_root or paths.DEFAULT_OUTPUT_ROOT)
        if not paths._inside(root, path) or not os.path.isfile(path) \
                or os.path.splitext(path)[1].lower() not in k2s.IMAGE_EXTS:
            raise FileNotFoundError("Not found")
        return web.FileResponse(path)

    # ---------------- cycling text pickers ----------------
    # The reference exposes these as graph nodes only
    # (VRGDG_GeneralNodes.py:2473-3151); here they get the natural HTTP
    # surface for the same deterministic selection math.

    from ..runtime import text_pickers as tp

    _sync_json_route("/vrgdg/text_tools/pick",
                     lambda p: tp.pick_text(
                         p.get("index", 0), p.get("items", ""),
                         label=p.get("label", ""),
                         max_items=int(p.get("max_items", 0) or 0),
                         split_mode=p.get("split_mode", "auto"),
                         selection_mode=p.get("selection_mode", "index"),
                         seed=p.get("seed", 0),
                         multi_format=p.get("multi_format", "auto"),
                         two_item_template=p.get(
                             "two_item_template",
                             tp.DEFAULT_TWO_ITEM_TEMPLATE),
                         keep_empty=bool(p.get("keep_empty", False)),
                         pick_count=int(p.get("pick_count", 1) or 1)))
    _sync_json_route("/vrgdg/text_tools/multi_pick",
                     lambda p: tp.run_multi_picker(
                         p.get("pickers") or [],
                         p.get("joiner", "newline")))

    # ---------------- graph-glue plans ----------------
    # The reference's multi-LoRA loaders and mute/group switchers are
    # graph nodes whose side-effect halves are ComfyUI-specific
    # (VRGDG_GeneralNodes2.py:1801-2357); their decision tables get the
    # natural HTTP surface here — payload in, the ordered
    # application/event plan out (oracle-fuzzed in
    # tests/test_graph_plans.py).

    from ..runtime import graph_plans as gp

    _sync_json_route("/vrgdg/graph/lora_plan", gp.lora_plan_from_payload)
    _sync_json_route("/vrgdg/graph/state_plan", gp.state_plan_from_payload)

    # ---------------- health + release notes ----------------
    # Release-notes schema parity: VRGDG_UpdateRoutes.py:65-93 (the git
    # self-update itself is excluded; this is the observability surface).

    from ..release_notes import latest_release, load_release_notes

    @routes.get("/vrgdg/health")
    @_handler
    def health(request):
        # liveness must not depend on the release-notes file parsing —
        # degrade to version+backend when it is missing or malformed
        # (/vrgdg/update/status keeps the strict parse for parity)
        try:
            notes, _source = load_release_notes()
            latest = latest_release(notes) or {}
        except Exception:
            notes, latest = {}, {}
        return _ok(version=_version(), backend=api.device_name(block=False),
                   product=notes.get("product"),
                   latest_release={key: latest.get(key)
                                   for key in ("version", "date", "title")}
                   if latest else None)

    @routes.get("/vrgdg/update/status")
    @_handler
    def update_status(request):
        notes, source = load_release_notes()
        return _ok(version=_version(), release_notes=notes,
                   release_notes_source=source)

    @routes.get("/vrgdg/node_canvas/status")
    @_handler
    def node_canvas_status(request):
        # VRGDG_VideoBuilderNodeUI.py:50-58 — the canvas prototype's
        # static status surface (its node is a graph passthrough; the
        # builder panel is this repo's canvas)
        return _ok(name="VRGDG Node Canvas Prototype", version=1,
                   builder_connected=False)

    # ---------------- workflow runner ----------------
    # Parameter-compatible prompt builders for an external ComfyUI-style
    # executor (VRGDG_WorkflowRunnerNodes.py:4288-4626); the prompt JSON
    # byte-matches the reference builders (tests/test_workflow_runner.py).

    @routes.get("/vrgdg/workflow_runner/lora_list")
    @_handler
    def wr_lora_list(request):
        return _ok(**workflow_runner.lora_list())

    @routes.get("/vrgdg/workflow_runner/i2v_choices")
    @_handler
    def wr_i2v_choices(request):
        return _ok(**workflow_runner.i2v_choices())

    @routes.get("/vrgdg/workflow_runner/builders")
    @_handler
    def wr_builders(request):
        # discovery surface for the panel/CLI: one row per
        # build_<key>_prompt route (clear_memory is registered
        # separately below but is a builder to callers)
        return _ok(builders=sorted(
            list(workflow_runner.BUILDERS) + ["clear_memory"]))

    @routes.get("/vrgdg/workflow_runner/model_root")
    @_handler
    def wr_model_root(request):
        result = workflow_runner.load_model_root(base_folder)
        # standalone: "registered" reports whether the root resolves
        result["registered"] = bool(
            result.get("models_root")
            and os.path.isdir(result["models_root"]))
        return _ok(**result)

    @routes.post("/vrgdg/workflow_runner/model_root")
    @_handler
    async def wr_save_model_root(request):
        payload = await _json(request)
        result = workflow_runner.save_model_root(
            payload.get("models_root", ""), base_folder)
        workflow_runner.set_default_catalog(None)  # re-scan on next use
        return _ok(**result)

    def _wr_build_route(key, builder):
        @_handler
        async def handler(request):
            payload = await _json(request)
            loop = asyncio.get_running_loop()
            result = await loop.run_in_executor(
                None, lambda: builder(payload, base=base_folder))
            return _ok(**result)
        handler.__name__ = f"wr_build_{key}_prompt"
        return handler

    for _key, _builder in workflow_runner.BUILDERS.items():
        routes.post(f"/vrgdg/workflow_runner/build_{_key}_prompt")(
            _wr_build_route(_key, _builder))

    @routes.post("/vrgdg/workflow_runner/build_clear_memory_prompt")
    @_handler
    def wr_build_clear_memory(request):
        return _ok(**workflow_runner.build_clear_memory_prompt())

    @routes.post("/vrgdg/workflow_runner/prepare_scene_audio_clip")
    @_handler
    async def wr_prepare_scene_audio(request):
        payload = await _json(request)
        loop = asyncio.get_running_loop()
        result = await loop.run_in_executor(
            None, lambda: workflow_runner.prepare_scene_audio_clip(
                payload, base=base_folder))
        return _ok(**result)

    def _wr_scene_route(name, fn, ffmpeg_errors=False):
        @_handler
        async def handler(request):
            payload = await _json(request)
            loop = asyncio.get_running_loop()
            try:
                result = await loop.run_in_executor(None,
                                                    lambda: fn(payload))
            except subprocess.CalledProcessError as exc:
                error = exc.stderr or exc.output or str(exc)
                return _err(RuntimeError(f"FFmpeg failed:\n{error}"))
            return _ok(**result)
        handler.__name__ = f"wr_{name}"
        return handler

    for _name, _fn in (
            ("collect_scene_video", scene_render.collect_scene_video),
            ("match_scene_video_start_color",
             scene_render.match_scene_start_color),
            ("trim_scene_video", scene_render.trim_scene_video),
            ("find_scene_video_output",
             scene_render.find_scene_video_output),
            ("stitch_scene_videos", scene_render.stitch_scene_videos),
            ("render_image_slideshow",
             scene_render.render_image_slideshow)):
        routes.post(f"/vrgdg/workflow_runner/{_name}")(
            _wr_scene_route(_name, _fn))

    @routes.post("/vrgdg/workflow_runner/save_image")
    @_handler
    async def wr_save_image(request):
        payload = await _json(request)
        loop = asyncio.get_running_loop()
        # file copy off the event loop like the sibling scene routes
        result = await loop.run_in_executor(
            None, lambda: scene_render.save_generated_image(
                payload, base=base_folder))
        return _ok(**result)

    # ---------------- web UI ----------------
    # Thin control panel standing in for the reference's ComfyUI browser
    # widgets (SURVEY.md L5 plan): enhancer, LUT catalog, compare.

    _STATIC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "static")

    @routes.get("/vrgdg/ui")
    @_handler
    def ui_index(request):
        return web.FileResponse(os.path.join(_STATIC, "index.html"))

    @routes.get("/")
    async def root_redirect(request):
        raise web.HTTPFound("/vrgdg/ui")

    app.add_routes(routes)
    return app


def _version():
    from .. import __version__

    return __version__


def main(host: str = "127.0.0.1", port: int = 8431,
         base_folder: str | None = None, luts_dir: str | None = None):
    web.run_app(create_app(base_folder, luts_dir), host=host, port=port)


if __name__ == "__main__":
    main()
