"""The Standalone Video Enhancer: a background-threaded, segment-checkpointed,
resumable render engine over the TPU grade stack.

This is the L3 job layer of SURVEY.md §1/§2.2 rebuilt around a jitted device
pipeline.  Semantics reproduced from the reference:

- settings schema + clamping (:class:`vrgdg_tpu.core.params.EnhancerSettings`,
  ``VRGDG_StandaloneVideoEnhancerNodes.py:142-180``),
- "fake upscale" output dimensions and auto batch size (``:183-210``),
- sharpen -> seeded grain effects order (``:278-294``), with per-frame
  seeding so output is invariant to batch boundaries (``:261-275``),
- per-segment render loop with ``.partial.mp4`` -> ``os.replace`` commit,
  manifest fingerprint + pruning, resume/cancel with ``can_resume``
  (``:513-655``),
- single-active-job guard, daemon worker thread, snapshot copies that strip
  live handles (``:20-23, 327-340, 658-711``),
- preview endpoint math (``:714-753``).

TPU-first differences: the LANCZOS4 resize runs **on device** as part of the
same jitted step as the effects (one host->device hop per batch instead of
cv2 resize + two hops); batch shapes are padded to a stable size so the
step compiles once per job; OOM adaptation keeps the reference's bisection
as a host-side fallback for RESOURCE_EXHAUSTED.
"""

from __future__ import annotations

import math
import os
import shutil
import threading
import time
import uuid
from collections import deque
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.params import EnhancerSettings, auto_batch_size, output_dimensions
from ..ops.grain import film_grain
from ..ops.resize import resample
from ..ops.sharpen import unsharp
from ..runtime import video_io

_DEFAULT_ROOT = os.environ.get(
    "VRGDG_TPU_OUTPUT", os.path.join(os.getcwd(), "vrgdg_output"))


def root_folder(base: str | None = None) -> str:
    path = os.path.join(base or _DEFAULT_ROOT, "VRGDG_VideoEnhancer")
    os.makedirs(path, exist_ok=True)
    return path


def upload_folder(base: str | None = None) -> str:
    path = os.path.join(root_folder(base), "uploads")
    os.makedirs(path, exist_ok=True)
    return path


def preview_folder(base: str | None = None) -> str:
    path = os.path.join(root_folder(base), "previews")
    os.makedirs(path, exist_ok=True)
    return path


def jobs_folder(base: str | None = None) -> str:
    path = os.path.join(root_folder(base), "jobs")
    os.makedirs(path, exist_ok=True)
    return path


# --------------------------------------------------------------------------
# Device pipeline
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("settings", "out_height", "out_width"))
def _enhance_step(frames: jnp.ndarray, settings: EnhancerSettings,
                  out_height: int, out_width: int,
                  frame_start: jnp.ndarray) -> jnp.ndarray:
    """Resize (device LANCZOS4) -> unsharp -> seeded grain, one fused pass."""
    out = resample(frames, out_height, out_width, "lanczos4")
    out = jnp.clip(out, 0.0, 1.0)
    if settings.sharpen_enabled and settings.sharpen_strength > 0:
        # use_accelerator maps to the reference's use_gpu border convention
        # (zero-padded avg_pool on GPU, edge-replicate on CPU) so outputs
        # are comparable for equal settings.
        border = "zero" if settings.use_accelerator else "edge"
        out = unsharp(out, settings.sharpen_strength, border)
    if settings.grain_enabled and settings.grain_intensity > 0:
        out = film_grain(out, settings.grain_intensity,
                         settings.saturation_mix, settings.seed,
                         frame_start=frame_start)
    return out


def mesh_for_settings(settings: EnhancerSettings):
    """Build the frame-axis data-parallel mesh the job will run on, or
    ``None`` for single-device (BASELINE config 5: "enhancer pipeline ...
    sharded over a TPU mesh").

    Every op in the enhance step is frame-local and grain is per-frame
    seeded, so frame-axis sharding is embarrassingly parallel and output
    is bit-identical to single-device by construction (locked by
    ``tests/test_enhancer_mesh.py``).
    """
    want = int(getattr(settings, "data_parallel", 0))
    spatial = max(1, int(getattr(settings, "spatial_parallel", 1)))
    if want == 1 and spatial == 1:
        return None
    n_visible = len(jax.devices())
    n_use = n_visible if want == 0 else min(want * spatial, n_visible)
    n_use = (n_use // spatial) * spatial
    if n_use <= 1:
        return None
    from ..parallel import make_mesh

    return make_mesh(n_use, spatial=spatial)


def submit_effects_batch(frames: np.ndarray, settings: EnhancerSettings,
                         out_height: int | None = None,
                         out_width: int | None = None,
                         frame_start: int = 0, mesh=None,
                         as_uint8: bool = False):
    """Dispatch the device step WITHOUT forcing the result.

    Returns ``(device_array, count)`` — the caller materializes with
    ``np.asarray(device_array[:count])``. JAX dispatch is asynchronous,
    so a second batch can be submitted while the first computes/
    transfers (the segment renderer double-buffers on this).

    With ``mesh`` set, the batch is padded to divide over the mesh's
    "data" axis (repeating the last frame; the padding is trimmed after)
    and sharded across chips; the same jitted step runs under GSPMD with
    zero collectives.

    ``as_uint8`` quantizes on device before the device->host transfer —
    bit-identical to quantizing on the host (it is the encoder's own
    math) and 4x less transfer, which dominates on remote-attached TPUs
    (measured 7 MB/s device->host on this environment's tunnel).
    """
    if out_height is None:
        out_height = int(frames.shape[1])
    if out_width is None:
        out_width = int(frames.shape[2])
    count = int(frames.shape[0])
    # uint8 input ships 4x fewer bytes over the host->device hop; pad and
    # place it on the mesh while still uint8 (4x cheaper resharding too),
    # then normalize on device (bit-identical to the host /255 path)
    device_frames = jnp.asarray(frames)
    if mesh is not None:
        from ..parallel import frame_sharding, pad_to_multiple

        device_frames, _ = pad_to_multiple(
            device_frames, mesh.shape["data"], axis=0)
        # height-axis spatial sharding only when the frame divides the
        # spatial axis evenly; otherwise frames stay whole per chip
        spatial = (mesh.shape["space"] > 1
                   and device_frames.shape[1] % mesh.shape["space"] == 0)
        device_frames = jax.device_put(device_frames,
                                       frame_sharding(mesh, spatial=spatial))
    device_frames = video_io.dequantize_on_device(device_frames)
    result = _enhance_step(device_frames, settings, int(out_height),
                           int(out_width), jnp.asarray(frame_start, jnp.uint32))
    if as_uint8:
        result = video_io.quantize_on_device(result)
    return result, count


def apply_effects_batch(frames: np.ndarray, settings: EnhancerSettings,
                        out_height: int | None = None,
                        out_width: int | None = None,
                        frame_start: int = 0, mesh=None,
                        as_uint8: bool = False) -> np.ndarray:
    """Host wrapper: BHWC float32 in, enhanced BHWC out (synchronous —
    see :func:`submit_effects_batch` for the async form)."""
    result, count = submit_effects_batch(frames, settings, out_height,
                                         out_width, frame_start, mesh=mesh,
                                         as_uint8=as_uint8)
    return np.asarray(result[:count])


def _is_oom(exc: Exception) -> bool:
    text = str(exc).lower()
    return "resource_exhausted" in text or "out of memory" in text


def process_with_retry(frames: np.ndarray, settings: EnhancerSettings,
                       out_height: int, out_width: int,
                       frame_start: int, mesh=None,
                       as_uint8: bool = False) -> tuple[np.ndarray, int]:
    """Bisect the batch on device OOM, like the reference's CUDA retry
    (``VRGDG_StandaloneVideoEnhancerNodes.py:297-308``); returns
    ``(frames, smallest_successful_batch)``."""
    try:
        out = apply_effects_batch(frames, settings, out_height, out_width,
                                  frame_start, mesh=mesh, as_uint8=as_uint8)
        return out, len(frames)
    except Exception as exc:
        if not _is_oom(exc) or len(frames) <= 1:
            raise
        midpoint = max(1, len(frames) // 2)
        left, left_n = process_with_retry(frames[:midpoint], settings,
                                          out_height, out_width, frame_start,
                                          mesh=mesh, as_uint8=as_uint8)
        right, right_n = process_with_retry(frames[midpoint:], settings,
                                            out_height, out_width,
                                            frame_start + midpoint, mesh=mesh,
                                            as_uint8=as_uint8)
        return np.concatenate([left, right], axis=0), min(left_n, right_n)


# --------------------------------------------------------------------------
# Job registry
# --------------------------------------------------------------------------

class JobRegistry:
    """Thread-safe job state store with cancel events
    (``VRGDG_StandaloneVideoEnhancerNodes.py:20-23, 327-340``)."""

    def __init__(self):
        self._lock = threading.RLock()
        self._jobs: dict[str, dict] = {}
        self._cancel: dict[str, threading.Event] = {}

    def update(self, job_id: str, **values) -> None:
        with self._lock:
            job = self._jobs.setdefault(job_id, {"job_id": job_id})
            job.update(values)
            job["updated_at"] = time.time()

    def snapshot(self, job_id: str) -> dict:
        with self._lock:
            job = dict(self._jobs.get(job_id) or {})
        job.pop("thread", None)
        job.pop("process", None)
        return job

    def all_snapshots(self) -> list[dict]:
        with self._lock:
            ids = list(self._jobs)
        return [self.snapshot(job_id) for job_id in ids]

    def cancel_event(self, job_id: str) -> threading.Event:
        with self._lock:
            return self._cancel.setdefault(job_id, threading.Event())

    def get_cancel(self, job_id: str) -> threading.Event | None:
        with self._lock:
            return self._cancel.get(job_id)

    def active_job(self, excluding: str = "") -> dict | None:
        with self._lock:
            for job in self._jobs.values():
                if (job.get("job_id") != excluding
                        and job.get("status") in {"queued", "running",
                                                  "encoding"}):
                    return dict(job)
        return None

    def attach(self, job_id: str, key: str, value) -> None:
        with self._lock:
            self._jobs.setdefault(job_id, {"job_id": job_id})[key] = value


JOBS = JobRegistry()


# --------------------------------------------------------------------------
# Render engine
# --------------------------------------------------------------------------

from . import manifest as mf  # noqa: E402  (sibling import after defs)


def _force_entry(in_flight: deque, settings, out_h: int, out_w: int, mesh,
                 smallest_batch: int, timer, writer) -> int:
    """Materialize the oldest in-flight device batch and encode it.

    A runtime OOM surfaces here (async dispatch defers execution errors
    to the blocking read); the retained host copy then goes through the
    synchronous bisection so behavior matches the non-pipelined loop."""
    (pending, padded, chunk_n, start) = in_flight.popleft()
    device_out, count = pending
    with timer.stage("device"):
        try:
            enhanced = np.asarray(device_out[:count])
            ok_batch = padded.shape[0]
        except Exception as exc:
            if not _is_oom(exc):
                raise
            enhanced, ok_batch = process_with_retry(
                padded, settings, out_h, out_w, start, mesh=mesh,
                as_uint8=True)
    with timer.stage("encode"):
        writer.write_array(enhanced[:chunk_n])
    return max(1, min(smallest_batch, ok_batch))


def _render_segment(source_path: str, segment_path: str, start_frame: int,
                    end_frame: int, metadata: dict,
                    settings: EnhancerSettings, job_id: str,
                    cancel_event: threading.Event,
                    registry: JobRegistry, mesh=None) -> tuple[int, int]:
    out_w, out_h = output_dimensions(metadata["width"], metadata["height"],
                                     settings.upscale_resolution)
    batch = settings.batch_size or auto_batch_size(out_w, out_h)
    n_chips = 1 if mesh is None else mesh.devices.size
    if mesh is not None:
        # Keep whole device-batches busy: at least one frame per chip.
        batch = max(batch, n_chips)
    frames_done = 0
    smallest_batch = batch
    started = time.time()
    from ..runtime.profiling import StageTimer

    timer = StageTimer()

    # Parallel chunked decode is opt-in (decode_workers > 1): chunk seeks
    # can land off-by-one on some OpenCV backends for open-GOP/B-frame/
    # VFR sources. The reader's boundary verification raises on
    # chunk-to-chunk seek inconsistency (it cannot see a uniform
    # all-seeks-shifted bias — see ParallelVideoReader's docstring), and
    # "auto" (0) stays sequential because the seek redundancy loses
    # below ~3 cores (BASELINE.md).
    workers = int(getattr(settings, "decode_workers", 0))
    if workers == 0:
        workers = 1

    writer = video_io.VideoWriter(segment_path, metadata["fps"], out_w, out_h)
    in_flight: deque = deque()
    pipeline_depth = max(1, int(os.environ.get("VRGDG_DISPATCH_DEPTH")
                                or 2))
    try:
        if workers > 1:
            reader = video_io.ParallelVideoReader(
                source_path, batch_size=smallest_batch,
                start_frame=start_frame, end_frame=end_frame,
                workers=workers, as_float=False)
        else:
            reader = video_io.VideoReader(source_path,
                                          batch_size=smallest_batch,
                                          start_frame=start_frame,
                                          end_frame=end_frame,
                                          as_float=False)
        # PrefetchingReader.close() stops and joins the pump thread before
        # releasing the capture, so it owns reader shutdown on every path.
        with video_io.PrefetchingReader(reader) as prefetch:
            iterator = iter(prefetch)
            while True:
                with timer.stage("decode"):
                    item = next(iterator, None)
                if item is None:
                    break
                frame_index, frames = item
                if cancel_event.is_set():
                    raise InterruptedError("Render canceled.")
                count = frames.shape[0]
                # Feed the device in chunks of the current OOM-proven batch
                # size so each batch triggers at most one bisection per job
                # (the reference reads min(smallest_batch, remaining) per
                # step, VRGDG_StandaloneVideoEnhancerNodes.py:410-418).
                # Short chunks are padded to the stable shape so the step
                # compiles once per shape, then trimmed. Chunks flow
                # through a depth-2 submit/force FIFO (async dispatch
                # overlaps upload+compute with download+encode; order and
                # bytes are unchanged — the cancel->resume byte-equality
                # check covers this path on chip). A runtime OOM surfaces
                # when forcing; the kept host copy is then re-run through
                # the synchronous bisection.
                offset = 0
                while offset < count:
                    chunk = frames[offset:offset + smallest_batch]
                    chunk_n = chunk.shape[0]
                    padded = chunk
                    if chunk_n < smallest_batch:
                        filler = np.repeat(chunk[-1:],
                                           smallest_batch - chunk_n, axis=0)
                        padded = np.concatenate([chunk, filler], axis=0)
                    submit_oom = False
                    with timer.stage("device"):
                        try:
                            # quantize on device: the device->host hop is
                            # the bottleneck on remote-attached TPUs
                            pending = submit_effects_batch(
                                padded, settings, out_h, out_w,
                                frame_index + offset, mesh=mesh,
                                as_uint8=True)
                            in_flight.append(
                                (pending, padded, chunk_n,
                                 frame_index + offset))
                        except Exception as exc:
                            if not _is_oom(exc):
                                raise
                            submit_oom = True
                    if submit_oom:
                        # Fallback runs OUTSIDE the device-stage context:
                        # _force_entry and the encode write below open
                        # their own timer stages, and StageTimer is a
                        # plain accumulator — nesting would double-count.
                        # Drain older pending chunks FIRST so frames stay
                        # in order, then bisect this one.
                        while in_flight:
                            smallest_batch = _force_entry(
                                in_flight, settings, out_h, out_w,
                                mesh, smallest_batch, timer, writer)
                        with timer.stage("device"):
                            enhanced, ok_batch = process_with_retry(
                                padded, settings, out_h, out_w,
                                frame_index + offset, mesh=mesh,
                                as_uint8=True)
                        smallest_batch = max(
                            1, min(smallest_batch, ok_batch))
                        with timer.stage("encode"):
                            writer.write_array(enhanced[:chunk_n])
                        offset += chunk_n
                        continue
                    if len(in_flight) >= pipeline_depth:
                        smallest_batch = _force_entry(
                            in_flight, settings, out_h, out_w, mesh,
                            smallest_batch, timer, writer)
                    offset += chunk_n
                frames_done += count
                current = int(registry.snapshot(job_id).get(
                    "frames_processed") or 0) + count
                total = max(1, int(metadata["frame_count"]))
                elapsed = max(1e-6, time.time() - started)
                registry.update(
                    job_id,
                    frames_processed=current,
                    progress=min(0.94, current / total * 0.94),
                    batch_size=smallest_batch,
                    mesh_devices=n_chips,
                    fps_per_chip=round(frames_done / elapsed / n_chips, 3),
                    stage_seconds=timer.seconds(),
                    message=(f"Upscaling and enhancing frames "
                             f"{current:,}/{total:,}"),
                )
            while in_flight:  # drain the dispatch pipeline
                smallest_batch = _force_entry(
                    in_flight, settings, out_h, out_w, mesh,
                    smallest_batch, timer, writer)
        if frames_done <= 0:
            raise RuntimeError(
                "The source video ended before this segment could be rendered.")
    finally:
        writer.close()
    return frames_done, smallest_batch, timer.seconds()


def render_job(job_id: str, payload: dict, resume: bool = False,
               registry: JobRegistry = JOBS, base_folder: str | None = None):
    """Full job flow (``VRGDG_StandaloneVideoEnhancerNodes.py:513-655``)."""
    from ..runtime.compile_cache import enable_compile_cache

    enable_compile_cache()
    cancel_event = registry.cancel_event(job_id)
    job_folder = os.path.join(jobs_folder(base_folder), job_id)
    segments_folder = os.path.join(job_folder, "segments")
    os.makedirs(segments_folder, exist_ok=True)
    try:
        source_path = video_io.normalize_video_path(payload.get("source_path"))
        metadata = video_io.probe_video(source_path)
        settings = EnhancerSettings.normalize(payload.get("settings"))
        out_w, out_h = output_dimensions(metadata["width"],
                                         metadata["height"],
                                         settings.upscale_resolution)
        fingerprint = mf.settings_fingerprint(source_path, settings.to_dict(),
                                              metadata["frame_count"])
        manifest = mf.read_manifest(job_folder) if resume else {}
        if manifest and manifest.get("fingerprint") != fingerprint:
            raise ValueError(
                "The source video or enhancement settings changed, so this "
                "job cannot resume.")

        mesh = mesh_for_settings(settings)
        frames_per_segment = max(1, int(round(
            float(metadata["fps"]) * settings.segment_seconds)))
        total_segments = max(1, int(math.ceil(
            metadata["frame_count"] / frames_per_segment)))
        completed = mf.prune_completed(manifest.get("completed_segments"),
                                       total_segments, segments_folder)
        completed_frames = sum(
            max(0, min(metadata["frame_count"],
                       (i + 1) * frames_per_segment) - i * frames_per_segment)
            for i in completed)

        manifest = {
            "version": 1,
            "job_id": job_id,
            "fingerprint": fingerprint,
            "source_path": source_path,
            "settings": settings.to_dict(),
            "metadata": metadata,
            "completed_segments": sorted(completed),
        }
        mf.write_manifest(job_folder, manifest)
        registry.update(
            job_id, status="running", stage="enhancing",
            source_path=source_path, metadata=metadata,
            settings=settings.to_dict(), output_width=out_w,
            output_height=out_h, frames_processed=completed_frames,
            total_frames=metadata["frame_count"],
            segment_index=len(completed), total_segments=total_segments,
            progress=(completed_frames / max(1, metadata["frame_count"])) * 0.94,
            can_resume=False, error="",
            message=f"Starting {out_w}×{out_h} batched enhancement…",
        )

        # ``stage_seconds`` in the live status is the current segment's
        # split (reset per checkpoint); ``stage_seconds_total`` accumulates
        # across the whole job so the final snapshot carries the full
        # decode/device/encode breakdown.
        stage_totals: dict[str, float] = {}
        for segment_index in range(total_segments):
            if segment_index in completed:
                continue
            if cancel_event.is_set():
                raise InterruptedError("Render canceled.")
            start = segment_index * frames_per_segment
            end = min(metadata["frame_count"], start + frames_per_segment)
            segment_path = os.path.join(
                segments_folder, mf.segment_file_name(segment_index))
            partial_path = segment_path + ".partial.mp4"
            if os.path.isfile(partial_path):
                os.remove(partial_path)
            registry.update(
                job_id, segment_index=segment_index + 1,
                message=(f"Enhancing checkpoint {segment_index + 1}/"
                         f"{total_segments}"))
            frames_done, _, segment_stages = _render_segment(
                source_path, partial_path, start, end, metadata, settings,
                job_id, cancel_event, registry, mesh=mesh)
            os.replace(partial_path, segment_path)
            completed.add(segment_index)
            manifest["completed_segments"] = sorted(completed)
            mf.write_manifest(job_folder, manifest)
            for stage, seconds in segment_stages.items():
                stage_totals[stage] = round(
                    stage_totals.get(stage, 0.0) + seconds, 6)
            registry.update(
                job_id,
                frames_processed=min(metadata["frame_count"],
                                     start + frames_done),
                stage_seconds_total=dict(stage_totals),
                segment_index=segment_index + 1)

        segment_paths = [
            os.path.join(segments_folder, mf.segment_file_name(i))
            for i in range(total_segments)
        ]
        stem = os.path.splitext(settings.output_name)[0] or "enhanced_video"
        output_name = f"{stem}_{time.strftime('%Y%m%d_%H%M%S')}.mp4"
        output_path = os.path.join(root_folder(base_folder), output_name)
        registry.update(job_id, stage="encoding", progress=0.95,
                        message="Joining segments and restoring audio…")
        concat_started = time.time()
        concat_result = video_io.concat_videos(
            segment_paths, output_path, metadata["fps"], out_w, out_h,
            source_audio_path=source_path,
            preserve_audio=settings.preserve_audio,
            crf=settings.encode_crf, preset=settings.encode_preset,
            cancel_event=cancel_event,
            log_path=os.path.join(job_folder, "ffmpeg.log"))
        stage_totals["concat"] = round(time.time() - concat_started, 6)
        output_metadata = video_io.probe_video(output_path)
        manifest.update(output_path=output_path, status="complete",
                        completed_segments=[], checkpoints_cleaned=True)
        mf.write_manifest(job_folder, manifest)
        shutil.rmtree(segments_folder, ignore_errors=True)
        registry.update(
            job_id, status="complete", stage="complete", progress=1.0,
            frames_processed=metadata["frame_count"],
            output_path=output_path, output_metadata=output_metadata,
            encode_backend=concat_result["backend"],
            audio_preserved=concat_result["audio"],
            stage_seconds_total=dict(stage_totals),
            checkpoints_cleaned=True, can_resume=False,
            message="Enhancement complete.")
    except InterruptedError as exc:
        registry.update(job_id, status="canceled", stage="canceled",
                        can_resume=True, error="", message=str(exc))
    except Exception as exc:
        registry.update(job_id, status="failed", stage="failed",
                        can_resume=True, error=str(exc),
                        message=f"Render failed: {exc}")


def render_job_shards(job_id: str, payload: dict, process_index: int,
                      process_count: int, registry: JobRegistry = JOBS,
                      base_folder: str | None = None,
                      wait_timeout: float = 900.0) -> dict:
    """Distributed segment scheduler: shard *segments across processes*.

    SURVEY.md section 2.7/5.7 ("segment = shard unit", the video analog of
    context parallelism): every participating process computes the same
    segment plan from the shared payload, rank ``i`` renders segments
    ``i::process_count`` into the SHARED job folder using the same
    ``.partial.mp4`` -> ``os.replace`` commit protocol as
    :func:`render_job`, and rank 0 — whose committed-file scan is the
    completion barrier — concatenates and finalizes once every segment
    file exists. Within each rank's device step the frame axis may
    additionally be mesh-sharded (``mesh_for_settings``), so the two
    sharding levels compose.

    Coordination is entirely filesystem-based (atomic renames on one
    shared folder): no collective is needed because segments are
    independent and the per-frame-seeded grain contract makes output
    bytes independent of which process rendered which segment —
    ``tests/test_distributed.py`` asserts the 2-process output is
    byte-identical to the single-process one. Resume works per rank by
    skipping committed files; a dead worker surfaces as rank 0's wait
    timeout with the missing segment list.

    Returns the final snapshot (rank 0) or a per-rank summary.
    """
    if process_count < 1 or not 0 <= process_index < process_count:
        raise ValueError("process_index/process_count are inconsistent.")
    cancel_event = registry.cancel_event(job_id)
    job_folder = os.path.join(jobs_folder(base_folder), job_id)
    segments_folder = os.path.join(job_folder, "segments")
    os.makedirs(segments_folder, exist_ok=True)

    source_path = video_io.normalize_video_path(payload.get("source_path"))
    metadata = video_io.probe_video(source_path)
    settings = EnhancerSettings.normalize(payload.get("settings"))
    out_w, out_h = output_dimensions(metadata["width"], metadata["height"],
                                     settings.upscale_resolution)
    fingerprint = mf.settings_fingerprint(source_path, settings.to_dict(),
                                          metadata["frame_count"])
    mesh = mesh_for_settings(settings)
    frames_per_segment = max(1, int(round(
        float(metadata["fps"]) * settings.segment_seconds)))
    total_segments = max(1, int(math.ceil(
        metadata["frame_count"] / frames_per_segment)))

    # Resume guard (same contract as render_job): a shared job folder
    # holding segments rendered under a DIFFERENT source/settings must
    # refuse, not silently mix old and new segments into one output.
    existing = mf.read_manifest(job_folder)
    if existing and existing.get("fingerprint") not in (None, fingerprint):
        raise ValueError(
            "The source video or enhancement settings changed, so this "
            "distributed job cannot resume; use a fresh job id.")

    if process_index == 0:
        # One manifest writer (rank 0) avoids read-modify-write races;
        # completion truth is the committed segment files themselves.
        mf.write_manifest(job_folder, {
            "version": 1, "job_id": job_id, "fingerprint": fingerprint,
            "source_path": source_path, "settings": settings.to_dict(),
            "metadata": metadata, "process_count": process_count,
            "total_segments": total_segments, "completed_segments": [],
        })

    def _committed(index: int) -> str:
        return os.path.join(segments_folder, mf.segment_file_name(index))

    mine = list(range(process_index, total_segments, process_count))
    rendered = []
    registry.update(job_id, status="running", stage="enhancing",
                    process_index=process_index,
                    process_count=process_count,
                    total_segments=total_segments,
                    segments_assigned=len(mine))
    for segment_index in mine:
        if cancel_event.is_set():
            raise InterruptedError("Render canceled.")
        segment_path = _committed(segment_index)
        if os.path.isfile(segment_path):
            continue  # resume: another run already committed it
        start = segment_index * frames_per_segment
        end = min(metadata["frame_count"], start + frames_per_segment)
        partial_path = (segment_path
                        + f".rank{process_index}.partial.mp4")
        if os.path.isfile(partial_path):
            os.remove(partial_path)
        _render_segment(source_path, partial_path, start, end, metadata,
                        settings, job_id, cancel_event, registry,
                        mesh=mesh)
        os.replace(partial_path, segment_path)
        rendered.append(segment_index)

    if process_index != 0:
        registry.update(job_id, status="complete", stage="complete",
                        message=f"rank {process_index} rendered "
                                f"{len(rendered)} segment(s)")
        return {"job_id": job_id, "process_index": process_index,
                "segments_rendered": rendered}

    # Rank 0: completion barrier = every segment file committed on disk.
    # ``wait_timeout`` is a STALL timeout, not a whole-job deadline: the
    # clock restarts every time another segment commits, so an
    # arbitrarily long job survives as long as workers keep making
    # progress and only a genuinely dead/stuck worker trips it.
    stall_started = time.time()
    missing_before = None
    while True:
        missing = [i for i in range(total_segments)
                   if not os.path.isfile(_committed(i))]
        if not missing:
            break
        if cancel_event.is_set():
            raise InterruptedError("Render canceled.")
        if missing_before is None or len(missing) < missing_before:
            missing_before = len(missing)
            stall_started = time.time()
        if time.time() - stall_started > float(wait_timeout):
            raise TimeoutError(
                f"Distributed render stalled for {wait_timeout:.0f}s "
                f"waiting for segments "
                f"{missing[:8]}{'...' if len(missing) > 8 else ''} — a "
                "worker process likely died; re-run to resume.")
        time.sleep(0.2)

    stem = os.path.splitext(settings.output_name)[0] or "enhanced_video"
    output_name = f"{stem}_{time.strftime('%Y%m%d_%H%M%S')}.mp4"
    output_path = os.path.join(root_folder(base_folder), output_name)
    concat_result = video_io.concat_videos(
        [_committed(i) for i in range(total_segments)], output_path,
        metadata["fps"], out_w, out_h, source_audio_path=source_path,
        preserve_audio=settings.preserve_audio, crf=settings.encode_crf,
        preset=settings.encode_preset, cancel_event=cancel_event,
        log_path=os.path.join(job_folder, "ffmpeg.log"))
    output_metadata = video_io.probe_video(output_path)
    mf.write_manifest(job_folder, {
        "version": 1, "job_id": job_id, "fingerprint": fingerprint,
        "source_path": source_path, "settings": settings.to_dict(),
        "metadata": metadata, "process_count": process_count,
        "total_segments": total_segments, "completed_segments": [],
        "output_path": output_path, "status": "complete",
        "checkpoints_cleaned": True,
    })
    shutil.rmtree(segments_folder, ignore_errors=True)
    registry.update(job_id, status="complete", stage="complete",
                    progress=1.0, output_path=output_path,
                    output_metadata=output_metadata,
                    encode_backend=concat_result["backend"],
                    audio_preserved=concat_result["audio"])
    return registry.snapshot(job_id)


def start_render(payload: dict, resume_job_id: str = "",
                 registry: JobRegistry = JOBS,
                 base_folder: str | None = None) -> dict:
    """Queue a render job on a daemon thread with the reference's
    single-active-job and resume-rehydration semantics
    (``VRGDG_StandaloneVideoEnhancerNodes.py:658-711``)."""
    resume_job_id = str(resume_job_id or "").strip()
    active = registry.active_job(excluding=resume_job_id)
    if active:
        raise ValueError(
            f"Enhancement job {active.get('job_id')} is already running. "
            "Wait for it to finish or cancel it first.")
    if resume_job_id:
        job_id = resume_job_id
        existing = registry.snapshot(job_id)
        if existing.get("status") in {"running", "encoding"}:
            raise ValueError("That enhancement job is already running.")
        if not existing or not (payload or {}).get("source_path"):
            # job lost from memory (process restart) or the caller sent no
            # payload: rehydrate from the on-disk manifest
            job_folder = os.path.join(jobs_folder(base_folder), job_id)
            manifest = mf.read_manifest(job_folder)
            if not manifest:
                raise ValueError(
                    "The requested render checkpoint was not found.")
            payload = {"source_path": manifest.get("source_path"),
                       "settings": manifest.get("settings")}
    else:
        job_id = (f"enhancer_{time.strftime('%Y%m%d_%H%M%S')}_"
                  f"{uuid.uuid4().hex[:8]}")
    cancel = registry.cancel_event(job_id)
    cancel.clear()
    registry.update(job_id, status="queued", stage="queued", progress=0.0,
                    created_at=time.time(), can_resume=False,
                    message="Queued…")
    thread = threading.Thread(
        target=render_job, args=(job_id, payload, bool(resume_job_id)),
        kwargs={"registry": registry, "base_folder": base_folder},
        daemon=True, name=f"VRGDGTPUEnhancer-{job_id}")
    registry.attach(job_id, "thread", thread)
    thread.start()
    return registry.snapshot(job_id)


def cancel_render(job_id: str, registry: JobRegistry = JOBS) -> dict:
    event = registry.get_cancel(job_id)
    if event is None:
        raise ValueError("Enhancement job was not found.")
    event.set()
    return registry.snapshot(job_id)


def preview_frame(source_path: str, timestamp: float, settings,
                  base_folder: str | None = None) -> dict:
    """Render a before/after PNG pair for one frame
    (``VRGDG_StandaloneVideoEnhancerNodes.py:714-753``)."""
    import cv2

    settings = (settings if isinstance(settings, EnhancerSettings)
                else EnhancerSettings.normalize(settings))
    source_path = video_io.normalize_video_path(source_path)
    metadata = video_io.probe_video(source_path)
    capture = cv2.VideoCapture(source_path)
    try:
        # ms-accurate seek first, then fall back to the first frame
        seeks = ((cv2.CAP_PROP_POS_MSEC,
                  max(0.0, float(timestamp)) * 1000.0),
                 (cv2.CAP_PROP_POS_FRAMES, 0.0))
        for prop, position in seeks:
            capture.set(prop, position)
            ok, frame = capture.read()
            if ok:
                break
        else:
            raise RuntimeError("Could not decode the selected preview frame.")
    finally:
        capture.release()
    frame_index = max(0, min(metadata["frame_count"] - 1,
                             int(round(float(timestamp) * metadata["fps"]))))
    out_w, out_h = output_dimensions(metadata["width"], metadata["height"],
                                     settings.upscale_resolution)
    batch = video_io.frames_to_array([frame])
    enhanced = apply_effects_batch(batch, settings, out_h, out_w, frame_index)
    after = video_io.array_to_frames(enhanced)[0]

    token = f"preview_{uuid.uuid4().hex}"
    before_path = os.path.join(preview_folder(base_folder),
                               f"{token}_before.png")
    after_path = os.path.join(preview_folder(base_folder),
                              f"{token}_after.png")
    if not cv2.imwrite(before_path, frame) or not cv2.imwrite(after_path, after):
        raise RuntimeError("Could not save the preview images.")
    return {
        "before_path": before_path,
        "after_path": after_path,
        "timestamp": max(0.0, float(timestamp)),
        "frame_index": frame_index,
        "metadata": metadata,
        "output_width": out_w,
        "output_height": out_h,
    }
