"""Host-side media I/O: probing, batched decode, codec-fallback encode.

This is the L2 layer of SURVEY.md §1 rebuilt for a TPU host: OpenCV handles
decode/encode on the CPU while frames stream to the accelerator as BHWC
float32 [0,1] batches.  Functional parity targets:

- probe/path validation: ``VRGDG_StandaloneVideoEnhancerNodes.py:98-139``,
- codec fallback chain with read-back validation:
  ``VRGDG_LUTVideoTools.py:26-31, 966-1023`` (avc1 -> H264 -> X264 -> mp4v,
  keep the first codec whose output re-opens),
- ffmpeg re-encode + audio remux: ``VRGDG_LUTVideoTools.py:859-916`` and
  the enhancer's concat+mux (``VRGDG_StandaloneVideoEnhancerNodes.py:444-510``).
  The ffmpeg binary is optional here: every ffmpeg step degrades cleanly
  (concat falls back to cv2 re-encode; audio remux is skipped with a note).
"""

from __future__ import annotations

import contextlib
import hashlib
import math
import os
import queue
import re
import shutil
import subprocess
import threading
import time
from dataclasses import dataclass
from typing import Callable, Iterator

import numpy as np

VIDEO_EXTENSIONS = {".mp4", ".mov", ".mkv", ".webm", ".avi", ".m4v"}
IMAGE_EXTENSIONS = {".png", ".jpg", ".jpeg", ".webp", ".bmp"}

# Preference order from the reference (VRGDG_LUTVideoTools.py:26-31).
CODEC_CANDIDATES = ("avc1", "H264", "X264", "mp4v")


def safe_name(value, fallback: str = "video") -> str:
    """Sanitize a user-supplied file name
    (``VRGDG_StandaloneVideoEnhancerNodes.py:26-31``)."""
    name = os.path.basename(str(value or "").strip()) or fallback
    stem, ext = os.path.splitext(name)
    stem = re.sub(r"[^A-Za-z0-9._-]+", "_", stem).strip("._") or fallback
    ext = re.sub(r"[^A-Za-z0-9.]+", "", ext)
    return stem[:100] + ext[:12]


def normalize_video_path(value) -> str:
    path = os.path.normpath(os.path.abspath(str(value or "").strip().strip('"')))
    if not os.path.isfile(path):
        raise FileNotFoundError(f"Video file was not found: {path}")
    if os.path.splitext(path)[1].lower() not in VIDEO_EXTENSIONS:
        raise ValueError(
            "Unsupported video type. Use MP4, MOV, MKV, WEBM, AVI, or M4V.")
    return path


def find_ffmpeg() -> str | None:
    return shutil.which("ffmpeg")


def media_has_audio(path: str) -> bool | None:
    """True/False when ffprobe is available, None otherwise."""
    ffprobe = shutil.which("ffprobe")
    if not ffprobe:
        return None
    try:
        result = subprocess.run(
            [ffprobe, "-v", "error", "-select_streams", "a:0",
             "-show_entries", "stream=index", "-of", "csv=p=0", path],
            capture_output=True, text=True, errors="replace", timeout=30,
            check=False)
        return bool(result.returncode == 0 and (result.stdout or "").strip())
    except Exception:
        return None


def probe_video(path) -> dict:
    """Metadata dict with the same fields as the reference's ``_probe_video``
    (``VRGDG_StandaloneVideoEnhancerNodes.py:107-139``)."""
    import cv2

    path = normalize_video_path(path)
    capture = cv2.VideoCapture(path)
    try:
        if not capture.isOpened():
            raise ValueError("The video could not be opened.")
        width, height, frame_count = (
            int(capture.get(prop) or 0)
            for prop in (cv2.CAP_PROP_FRAME_WIDTH, cv2.CAP_PROP_FRAME_HEIGHT,
                         cv2.CAP_PROP_FRAME_COUNT))
        fps = float(capture.get(cv2.CAP_PROP_FPS) or 0)
        if width < 1 or height < 1 or fps <= 0:
            raise ValueError(
                "The video does not contain readable dimensions or frame-rate "
                "metadata.")
        fourcc = int(capture.get(cv2.CAP_PROP_FOURCC) or 0)
        codec = "".join(chr((fourcc >> (8 * i)) & 0xFF) for i in range(4)).strip()
    finally:
        capture.release()
    stat = os.stat(path)
    return {
        "path": path, "name": os.path.basename(path),
        "width": width, "height": height,
        "fps": fps, "frame_count": frame_count,
        "duration": frame_count / fps if frame_count > 0 else 0.0,
        "codec": codec, "has_audio": media_has_audio(path),
        "size": int(stat.st_size), "mtime": float(stat.st_mtime),
    }


def frames_to_array(frames: list[np.ndarray]) -> np.ndarray:
    """BGR uint8 frame list -> BHWC float32 RGB in [0,1]."""
    stacked = np.stack(frames, axis=0)
    rgb = stacked[..., ::-1]  # BGR -> RGB
    return np.ascontiguousarray(rgb, dtype=np.float32) / 255.0


def array_to_frames(array: np.ndarray) -> list[np.ndarray]:
    """BHWC RGB -> list of BGR uint8 frames.

    Accepts float [0,1] (quantized here) or uint8 (already quantized —
    producers quantize ON DEVICE before the device->host transfer, which
    is 4x smaller; the math is identical to the float path's
    ``clip(x*255).astype(uint8)``)."""
    array = np.asarray(array)
    if array.dtype == np.uint8:
        u8 = array
    else:
        u8 = np.clip(array * 255.0, 0, 255).astype(np.uint8)
    return [np.ascontiguousarray(frame[..., ::-1]) for frame in u8]


def quantize_on_device(frames):
    """[0,1] float device array -> uint8 on device, bit-identical to the
    host path in :func:`array_to_frames` (jnp astype truncates like
    numpy's)."""
    import jax.numpy as jnp

    return jnp.clip(frames * 255.0, 0, 255).astype(jnp.uint8)


def frames_to_rgb_u8(frames: list[np.ndarray]) -> np.ndarray:
    """BGR uint8 frame list -> BHWC uint8 RGB (no float conversion).

    Host->device transfer is the production bottleneck on remote-attached
    TPUs (measured ~70 MB/s effective on this environment's tunnel), so
    decoded frames ship as uint8 — 4x fewer bytes — and are normalized to
    [0,1] float on device (:func:`dequantize_on_device`), which is the
    same IEEE ``x / 255.0`` the host path computes."""
    stacked = np.stack(frames, axis=0)
    return np.ascontiguousarray(stacked[..., ::-1])


def dequantize_on_device(frames):
    """uint8 device array -> [0,1] float32; float input passes through.

    Note: XLA lowers the f32 division to a reciprocal multiply, which can
    differ from numpy's correctly-rounded true division by 1 ulp (~1e-8)
    for some of the 256 levels — far inside the 1e-3 parity budget, and
    every determinism contract (batch/shard/resume invariance) holds
    bit-exactly because all paths share this device-side conversion."""
    import jax.numpy as jnp

    if frames.dtype == jnp.uint8:
        return frames.astype(jnp.float32) / 255.0
    return frames


class VideoReader:
    """Batched frame reader over a video file.

    Yields BHWC float32 RGB [0,1] numpy arrays of ``batch_size`` frames
    (the final batch may be short).
    """

    def __init__(self, path, batch_size: int = 8,
                 start_frame: int = 0, end_frame: int | None = None,
                 as_float: bool = True):
        import cv2

        self.path = normalize_video_path(path)
        self.batch_size = max(1, int(batch_size))
        self.as_float = bool(as_float)
        self._capture = cv2.VideoCapture(self.path)
        if not self._capture.isOpened():
            raise RuntimeError(f"Could not open video: {self.path}")
        self.start_frame = max(0, int(start_frame))
        if self.start_frame:
            self._capture.set(cv2.CAP_PROP_POS_FRAMES, self.start_frame)
        self.end_frame = end_frame
        self._position = self.start_frame

    def __iter__(self) -> Iterator[tuple[int, np.ndarray]]:
        """Yields ``(first_frame_index, batch)`` pairs."""
        while True:
            limit = self.batch_size
            if self.end_frame is not None:
                limit = min(limit, self.end_frame - self._position)
                if limit <= 0:
                    return
            frames = []
            for _ in range(limit):
                ok, frame = self._capture.read()
                if not ok:
                    break
                frames.append(frame)
            if not frames:
                return
            start = self._position
            self._position += len(frames)
            yield start, (frames_to_array(frames) if self.as_float
                          else frames_to_rgb_u8(frames))

    def close(self):
        self._capture.release()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


@dataclass
class _OpenWriter:
    writer: object
    codec: str
    path: str


def _try_open_writer(path: str, codec: str, fps: float,
                     width: int, height: int):
    import cv2

    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*codec),
                             float(fps), (int(width), int(height)))
    if writer.isOpened():
        return writer
    writer.release()
    return None


def validate_video_readable(path: str) -> bool:
    """Read-back check used by the codec fallback chain
    (``VRGDG_LUTVideoTools.py:761-771``)."""
    import cv2

    if not os.path.isfile(path) or os.path.getsize(path) <= 0:
        return False
    capture = cv2.VideoCapture(path)
    try:
        if not capture.isOpened():
            return False
        ok, _ = capture.read()
        return bool(ok)
    finally:
        capture.release()


class VideoWriter:
    """cv2 writer with the reference's codec preference order.

    The first codec that opens is used; :func:`write_video_with_fallback`
    adds the full write-then-validate retry loop.
    """

    def __init__(self, path, fps: float, width: int, height: int,
                 codecs: tuple[str, ...] = CODEC_CANDIDATES):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.path = os.fspath(path)
        self.codec = None
        self._writer = None
        for codec in codecs:
            writer = _try_open_writer(self.path, codec, fps, width, height)
            if writer is not None:
                self._writer, self.codec = writer, codec
                break
        if self._writer is None:
            raise RuntimeError(
                f"No available codec could encode {self.path} "
                f"(tried {', '.join(codecs)}).")
        self.frames_written = 0

    def write_array(self, array: np.ndarray):
        for frame in array_to_frames(array):
            self._writer.write(frame)
            self.frames_written += 1

    def write_bgr(self, frame: np.ndarray):
        self._writer.write(frame)
        self.frames_written += 1

    def close(self):
        if self._writer is not None:
            self._writer.release()
            self._writer = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def write_video_with_fallback(path, fps: float, width: int, height: int,
                              produce_batches: Callable[[], Iterator[np.ndarray]],
                              codecs: tuple[str, ...] = CODEC_CANDIDATES) -> str:
    """Encode with each candidate codec until the output validates on
    read-back, re-running the producer per attempt
    (``VRGDG_LUTVideoTools.py:966-1023`` semantics)."""
    last_error = None
    for codec in codecs:
        try:
            with VideoWriter(path, fps, width, height, (codec,)) as writer:
                for batch in produce_batches():
                    writer.write_array(batch)
            if validate_video_readable(path):
                return codec
            last_error = RuntimeError(f"Codec {codec} produced unreadable output.")
        except RuntimeError as exc:
            last_error = exc
        with contextlib.suppress(OSError):
            os.remove(path)
    raise RuntimeError(f"All codecs failed for {path}: {last_error}")


def concat_videos(segment_paths: list[str], output_path: str, fps: float,
                  width: int, height: int, source_audio_path: str | None = None,
                  preserve_audio: bool = True, crf: int = 18,
                  preset: str = "medium",
                  cancel_event: threading.Event | None = None,
                  log_path: str | None = None) -> dict:
    """Join rendered segments into the final video.

    With ffmpeg available this is the reference's concat-demuxer + libx264 +
    audio-remux command (``VRGDG_StandaloneVideoEnhancerNodes.py:444-510``);
    without it, the native MP4 stream-copy concatenator joins the segments
    losslessly in seconds (no audio), and only if that is unavailable or
    refuses the inputs are segments re-encoded through the cv2 codec
    chain.  Returns ``{"backend", "audio"}``.
    """
    ffmpeg = find_ffmpeg()
    if ffmpeg is not None:
        return _concat_ffmpeg(ffmpeg, segment_paths, output_path,
                              source_audio_path if preserve_audio else None,
                              crf, preset, cancel_event, log_path)

    if cancel_event is not None and cancel_event.is_set():
        raise InterruptedError("Render canceled.")
    if all(os.path.splitext(p)[1].lower() in {".mp4", ".m4v", ".mov"}
           for p in segment_paths):
        try:
            from ..native import concat_mp4_stream_copy

            concat_mp4_stream_copy([os.path.abspath(p)
                                    for p in segment_paths],
                                   os.path.abspath(output_path))
            if validate_video_readable(output_path):
                return {"backend": "native:mp4concat", "audio": False}
            with contextlib.suppress(OSError):
                os.remove(output_path)
        except Exception as exc:  # noqa: BLE001 — any refusal -> re-encode
            print(f"[vrgdg_tpu] native mp4 concat unavailable "
                  f"({exc}); re-encoding segments.", flush=True)

    import cv2

    writer = VideoWriter(output_path, fps, width, height)
    try:
        for segment in segment_paths:
            capture = cv2.VideoCapture(segment)
            try:
                while True:
                    if cancel_event is not None and cancel_event.is_set():
                        raise InterruptedError("Render canceled.")
                    ok, frame = capture.read()
                    if not ok:
                        break
                    if frame.shape[1] != width or frame.shape[0] != height:
                        frame = cv2.resize(frame, (width, height),
                                           interpolation=cv2.INTER_LANCZOS4)
                    writer.write_bgr(frame)
            finally:
                capture.release()
    finally:
        writer.close()
    if not validate_video_readable(output_path):
        raise RuntimeError(f"Could not produce a readable final video at "
                           f"{output_path}.")
    return {"backend": f"cv2:{writer.codec}", "audio": False}


def _concat_ffmpeg(ffmpeg, segment_paths, output_path, audio_source,
                   crf, preset, cancel_event, log_path) -> dict:
    folder = os.path.dirname(os.path.abspath(segment_paths[0]))
    concat_list = os.path.join(folder, "segments.txt")
    with open(concat_list, "w", encoding="utf-8") as handle:
        for path in segment_paths:
            escaped = os.path.abspath(path).replace("\\", "/").replace("'", "'\\''")
            handle.write(f"file '{escaped}'\n")
    command = [ffmpeg, "-y", "-f", "concat", "-safe", "0", "-i", concat_list]
    if audio_source:
        command += ["-i", audio_source, "-map", "0:v:0", "-map", "1:a?"]
    else:
        command += ["-map", "0:v:0", "-an"]
    command += ["-c:v", "libx264", "-preset", str(preset), "-crf", str(crf),
                "-pix_fmt", "yuv420p"]
    if audio_source:
        command += ["-c:a", "aac", "-b:a", "192k"]
    command += ["-movflags", "+faststart", "-shortest", output_path]

    log_path = log_path or os.path.join(folder, "ffmpeg.log")
    with open(log_path, "w", encoding="utf-8", errors="replace") as log:
        process = subprocess.Popen(command, stdout=subprocess.DEVNULL,
                                   stderr=log, text=True, errors="replace")
        while process.poll() is None:
            if cancel_event is not None and cancel_event.wait(0.25):
                process.terminate()
                try:
                    process.wait(timeout=5)
                except subprocess.TimeoutExpired:
                    process.kill()
                raise InterruptedError("Render canceled.")
    if process.returncode != 0 or not os.path.isfile(output_path):
        tail = ""
        with contextlib.suppress(OSError):
            with open(log_path, "r", encoding="utf-8", errors="replace") as log:
                tail = log.read()[-1800:]
        raise RuntimeError(f"FFmpeg could not create the final video: {tail}")
    return {"backend": "ffmpeg:libx264", "audio": bool(audio_source)}


def pad_frames_array(frames: np.ndarray, pad_frames: int,
                     pad_front: bool = False) -> np.ndarray:
    """Repeat the first (preroll) or last (tail) frame ``pad_frames``
    times (``GeneralVideoNodes.py:1945-1988``)."""
    frames = np.asarray(frames)
    pad_frames = int(pad_frames)
    if frames.shape[0] == 0 or pad_frames <= 0:
        return frames
    edge = frames[:1] if pad_front else frames[-1:]
    padding = np.repeat(edge, pad_frames, axis=0)
    parts = [padding, frames] if pad_front else [frames, padding]
    return np.concatenate(parts, axis=0)


def split_frames(frames: np.ndarray, chunk_count: int,
                 frames_per_chunk: int) -> list[np.ndarray]:
    """Split a BHWC batch into ``chunk_count`` fixed-size chunks; chunks
    beyond the data are empty ``(0, H, W, C)`` batches
    (``/root/reference/nodes.py:790-840``, VRGDG_VideoSplitter — minus
    the node's fixed 50-output padding, which is graph plumbing)."""
    frames = np.asarray(frames)
    total = frames.shape[0] if frames.ndim else 0
    # placeholder spatial dims only when there is NO data to take the
    # real shape from (the reference's total==0 case, nodes.py:816-821)
    spatial = frames.shape[1:] if total else (512, 512, 3)
    empty = np.zeros((0, *spatial), frames.dtype if total else np.float32)
    out: list[np.ndarray] = []
    for i in range(max(1, int(chunk_count))):
        start = i * int(frames_per_chunk)
        out.append(frames[start:start + int(frames_per_chunk)]
                   if start < total else empty)
    return out


def add_preroll_frames(frames_per_scene: int, chunk_index: int,
                       preroll_frames: int = 6) -> tuple[int, int]:
    """Extra front frames for non-first chunks; returns
    ``(total_frames_to_generate, preroll_frames_to_trim)``
    (``video_preroll.py:1-11``)."""
    if int(chunk_index) == 0:
        return int(frames_per_scene), 0
    return int(frames_per_scene) + int(preroll_frames), int(preroll_frames)


def trim_image_batch(frames: np.ndarray, frames_per_scene: int,
                     preroll_frames: int, chunk_index: int,
                     tail_loss_frames: int = 6) -> np.ndarray:
    """Trim a chunked render's frame batch to the exact scene length
    (``GeneralVideoNodes.py:2047-2106``): drop the preroll at the front
    and the generator's tail-loss frames at the back, both only for
    non-first chunks, then clamp to ``frames_per_scene``."""
    frames = np.asarray(frames)
    total = frames.shape[0]
    start = int(preroll_frames) if int(chunk_index) > 0 else 0
    tail = int(tail_loss_frames) if int(chunk_index) > 0 else 0
    end = min(start + int(frames_per_scene), max(0, total - tail))
    start = max(0, min(start, total))
    end = max(start, min(end, total))
    return frames[start:end]


def trim_image_batch_srt(frames: np.ndarray, frames_per_scene: int,
                         pre_frames: int, chunk_index: int) -> np.ndarray:
    """SRT-mode trim variant (``GeneralVideoNodes2.py:756-826``,
    VRGDG_TrimImageBatch_SRTOnly): slice ``[pre_frames : pre_frames +
    frames_per_scene]`` with NO tail trim; the first chunk without
    preroll takes the batch head, and an empty slice falls back to the
    head rather than returning nothing."""
    frames = np.asarray(frames)
    total = frames.shape[0]
    if int(chunk_index) == 0 and int(pre_frames) <= 0:
        return frames[:min(int(frames_per_scene), total)]
    start = min(int(pre_frames), total)
    end = min(start + int(frames_per_scene), total)
    if end <= start:
        return frames[:min(int(frames_per_scene), total)]
    return frames[start:end]


def build_chunk_output_path(output_folder: str, chunk_index: int,
                            base_name: str = "video",
                            overwrite_mode: str = "overwrite",
                            srt_naming: bool = False) -> str:
    """Canonical output path for one chunk of a chunked render
    (``GeneralVideoNodes.py:1668-1789``).

    ``srt_naming=True`` uses the SRT pipeline's
    ``{base}_{index+1:04d}_{index:04d}`` double-numbered scheme (after
    stripping any trailing numeric groups from ``base_name``) and backs
    existing chunks up under their own names; the plain scheme is
    ``{base}_{index:04d}`` with timestamped ``.bak`` backups.  Returns
    the extension-less path stem the encoder appends to.
    """
    os.makedirs(output_folder, exist_ok=True)
    chunk_index = int(chunk_index)
    if srt_naming:
        base_name = re.sub(r"(?:_\d+)+$", "", base_name)
        filename = f"{base_name}_{chunk_index + 1:04d}_{chunk_index:04d}"
    else:
        filename = f"{base_name}_{chunk_index:04d}"
    output_path = os.path.join(output_folder, filename)
    if str(overwrite_mode).lower() == "backup":
        backup_dir = os.path.join(output_folder, "backup")
        os.makedirs(backup_dir, exist_ok=True)
        for name in os.listdir(output_folder):
            # exact-stem match: "video_0001" must not sweep the SRT-named
            # "video_0001_0000.mp4" (or "video_00010.mp4") into backup
            if name == filename + ".mp4":
                source = os.path.join(output_folder, name)
                if srt_naming:
                    destination = os.path.join(backup_dir, name)
                else:
                    stamp = time.strftime("%Y%m%d_%H%M%S")
                    destination = os.path.join(backup_dir,
                                               f"{name}.{stamp}.bak")
                os.replace(source, destination)
    return output_path


def trim_final_clip(output_folder: str, base_name: str,
                    frames_per_scene: int, audio_total_duration: float,
                    index: int, total_sets: int, fps: float,
                    overwrite: bool = True) -> str:
    """Trim the final padded chunk of a chunked render to the audio's
    remaining duration (``GeneralVideoNodes.py:1822-1893``): runs only for
    the last chunk, finds the highest-numbered ``{base}_NNNN.mp4``, and
    stream-copies the first ``remaining`` seconds (re-encoding through the
    cv2 codec chain when ffmpeg is unavailable).  Returns the final path
    ("" when not the last chunk or no chunk file exists)."""
    if int(index) != int(total_sets) - 1:
        return ""
    pattern = re.compile(rf"{re.escape(base_name)}_(\d{{4}})")
    files = [f for f in os.listdir(output_folder)
             if f.startswith(base_name + "_") and f.endswith(".mp4")
             and pattern.search(f)]
    if not files:
        return ""
    last_clip = os.path.join(
        output_folder, max(files, key=lambda f: int(pattern.search(f).group(1))))

    scene_duration = float(frames_per_scene) / float(fps)
    remaining = float(audio_total_duration) - float(index) * scene_duration
    if remaining <= 0:
        return last_clip

    final_path = last_clip if overwrite else os.path.join(
        output_folder, f"{base_name}_{int(index):04d}_trimmed.mp4")
    temp_path = final_path + ".tmp.mp4"
    ffmpeg = find_ffmpeg()
    if ffmpeg is not None:
        subprocess.run([ffmpeg, "-y", "-i", last_clip,
                        "-t", f"{remaining:.6f}", "-c", "copy", temp_path],
                       check=True, capture_output=True)
    else:
        import cv2

        meta_capture = cv2.VideoCapture(last_clip)
        clip_fps = float(meta_capture.get(cv2.CAP_PROP_FPS) or fps)
        width = int(meta_capture.get(cv2.CAP_PROP_FRAME_WIDTH))
        height = int(meta_capture.get(cv2.CAP_PROP_FRAME_HEIGHT))
        meta_capture.release()
        keep = max(1, int(round(remaining * clip_fps)))

        def produce():
            reader = VideoReader(last_clip, batch_size=8, end_frame=keep)
            with reader:
                for _, batch in reader:
                    yield batch

        write_video_with_fallback(temp_path, clip_fps, width, height,
                                  produce)
    os.replace(temp_path, final_path)
    return final_path


class ParallelVideoReader:
    """Multi-threaded chunked decoder: N worker threads each own a
    ``cv2.VideoCapture`` and decode interleaved frame chunks (cv2 releases
    the GIL during decode, so this is real parallelism), while the
    consumer reassembles batches in order.

    This is the SURVEY.md section 7 "parallel decoders + async device
    feed" host-throughput component: at device speeds beyond ~60 fps of
    4K, a single sequential ``VideoCapture.read`` loop starves the
    accelerator.  Chunk seeks use ``CAP_PROP_POS_FRAMES`` — the same
    mechanism the segment renderer already trusts for segment starts —
    and output is byte-identical to the sequential reader (tested).

    Caveats, measured honestly: each chunk seek re-decodes from the
    previous keyframe, so chunks should span several GOPs, and on hosts
    with few cores the seek redundancy loses to a single sequential
    reader (on this repo's 1-core CI/TPU container, 2-8 workers measured
    0.5-0.8x sequential).  Chunk seeks are frame-accurate on the codecs
    this framework writes, but open-GOP/B-frame/VFR sources can seek
    off-by-one on some OpenCV backends — which is why the enhancer keeps
    this reader opt-in (``decode_workers > 1``) and its ``auto`` setting
    sequential, and why ``verify_seeks`` (default on) makes each worker
    decode one pre-frame before its chunk so the consumer can assert it
    byte-matches the previous chunk's last frame. This catches
    chunk-to-chunk seek inconsistency (the off-by-one failure mode);
    a hypothetical bias that shifted EVERY seek — including chunk 0's —
    by the same amount would shift probes identically and pass, so
    sources suspected of that still belong on the sequential reader.

    Iterating yields ``(first_frame_index, batch)`` exactly like
    :class:`VideoReader`.
    """

    def __init__(self, path, batch_size: int = 8, start_frame: int = 0,
                 end_frame: int | None = None, workers: int = 2,
                 chunk_batches: int = 4, as_float: bool = True,
                 verify_seeks: bool = True):
        import cv2

        self.path = normalize_video_path(path)
        self.batch_size = max(1, int(batch_size))
        self.as_float = bool(as_float)
        self.start_frame = max(0, int(start_frame))
        if end_frame is None:
            probe = cv2.VideoCapture(self.path)
            try:
                end_frame = int(probe.get(cv2.CAP_PROP_FRAME_COUNT) or 0)
            finally:
                probe.release()
        self.end_frame = int(end_frame)
        self.workers = max(1, int(workers))
        self.verify_seeks = bool(verify_seeks)
        self.chunk_frames = self.batch_size * max(1, int(chunk_batches))
        self._stop = threading.Event()
        self._results: dict[int, list | None] = {}
        self._error: BaseException | None = None
        self._lock = threading.Lock()
        self._ready = threading.Condition(self._lock)
        self._chunks = list(range(self.start_frame, self.end_frame,
                                  self.chunk_frames))
        self._next_chunk = 0
        self._threads = [threading.Thread(target=self._worker, daemon=True)
                         for _ in range(min(self.workers,
                                            max(1, len(self._chunks))))]
        for thread in self._threads:
            thread.start()

    def _claim(self) -> int | None:
        with self._lock:
            if self._next_chunk >= len(self._chunks):
                return None
            index = self._next_chunk
            self._next_chunk += 1
            return index

    def _worker(self):
        import cv2

        index = None
        capture = None
        try:
            capture = cv2.VideoCapture(self.path)
            if not capture.isOpened():
                raise RuntimeError(f"Could not open video: {self.path}")
            while not self._stop.is_set():
                index = self._claim()
                if index is None:
                    return
                chunk_start = self._chunks[index]
                chunk_end = min(self.end_frame,
                                chunk_start + self.chunk_frames)
                # With verification on, land one frame early: the extra
                # decoded frame must equal the previous chunk's last frame
                # or the backend's seek is not frame-accurate here. The
                # pre-frame sits in the same GOP the seek re-decodes
                # anyway, so it costs one frame of work per chunk.
                probe_hash = None
                if self.verify_seeks and index > 0:
                    capture.set(cv2.CAP_PROP_POS_FRAMES, chunk_start - 1)
                    ok, probe = capture.read()
                    if ok:
                        probe_hash = hashlib.sha1(probe.tobytes()).digest()
                    else:  # pre-frame unreadable: fall back to direct seek
                        capture.set(cv2.CAP_PROP_POS_FRAMES, chunk_start)
                else:
                    capture.set(cv2.CAP_PROP_POS_FRAMES, chunk_start)
                frames = []
                for _ in range(chunk_end - chunk_start):
                    ok, frame = capture.read()
                    if not ok:
                        break
                    frames.append(frame)
                with self._ready:
                    self._results[index] = (probe_hash, frames)
                    self._ready.notify_all()
                index = None
                # simple backpressure: don't run more than ~2 chunks/worker
                # ahead of the consumer
                while not self._stop.is_set():
                    with self._ready:
                        if len(self._results) <= 2 * len(self._threads):
                            break
                    self._stop.wait(0.02)
        except BaseException as exc:
            # publish the failure so the consumer raises instead of
            # hanging on the never-delivered chunk
            with self._ready:
                self._error = exc
                if index is not None:
                    self._results[index] = None
                self._ready.notify_all()
        finally:
            if capture is not None:
                capture.release()

    def __iter__(self) -> Iterator[tuple[int, np.ndarray]]:
        convert = frames_to_array if self.as_float else frames_to_rgb_u8
        pending: list[np.ndarray] = []
        position = self.start_frame
        last_hash: bytes | None = None
        for index in range(len(self._chunks)):
            with self._ready:
                while index not in self._results:
                    if self._error is not None:
                        raise RuntimeError(
                            "Parallel decoder worker failed") \
                            from self._error
                    if not any(t.is_alive() for t in self._threads) \
                            and index not in self._results:
                        raise RuntimeError(
                            "Parallel decoder workers exited early.")
                    self._ready.wait(0.05)
                result = self._results.pop(index)
                self._ready.notify_all()
            if result is None:
                raise RuntimeError("Parallel decoder worker failed") \
                    from self._error
            probe_hash, frames = result
            if probe_hash is not None and last_hash is not None \
                    and probe_hash != last_hash:
                raise RuntimeError(
                    f"Chunk seek misalignment at frame "
                    f"{self._chunks[index]} of {self.path}: this source's "
                    f"seeks are not frame-accurate on this backend "
                    f"(open-GOP/B-frame/VFR?). Use the sequential reader "
                    f"(decode_workers=0).")
            if self.verify_seeks and frames:
                last_hash = hashlib.sha1(frames[-1].tobytes()).digest()
            pending.extend(frames)
            while len(pending) >= self.batch_size:
                batch = pending[:self.batch_size]
                pending = pending[self.batch_size:]
                yield position, convert(batch)
                position += len(batch)
            chunk_start = self._chunks[index]
            expected = min(self.end_frame, chunk_start + self.chunk_frames) \
                - chunk_start
            if len(frames) < expected:
                break  # stream ended early; later chunks would misalign
        if pending:
            yield position, convert(pending)

    def close(self):
        self._stop.set()
        with self._ready:
            self._results.clear()
            self._ready.notify_all()
        for thread in self._threads:
            thread.join(timeout=10)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class PrefetchingReader:
    """Decode-ahead wrapper: a background thread keeps ``depth`` decoded
    batches queued so device compute overlaps host decode — the streaming
    half of SURVEY.md §7 step 4."""

    _SENTINEL = object()

    def __init__(self, reader: VideoReader, depth: int = 2):
        self._reader = reader
        self._queue: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self._error: BaseException | None = None
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._pump, daemon=True)
        self._thread.start()

    def _put(self, item) -> bool:
        """Blocking put that aborts when :meth:`close` sets the stop flag
        (so the pump never deadlocks against a departed consumer)."""
        while not self._stop.is_set():
            try:
                self._queue.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _pump(self):
        try:
            for item in self._reader:
                if not self._put(item):
                    return
        except BaseException as exc:  # propagated on next __iter__ step
            if not self._stop.is_set():
                self._error = exc
        finally:
            self._put(self._SENTINEL)

    def __iter__(self):
        while True:
            item = self._queue.get()
            if item is self._SENTINEL:
                if self._error is not None:
                    raise self._error
                return
            yield item

    def close(self):
        # cv2 capture release is not safe concurrent with capture.read(),
        # so stop the pump, unblock any pending put, and join it before
        # releasing the underlying reader.  If the pump refuses to exit
        # (a wedged decoder read), leak the capture rather than release
        # it under a live reader.
        self._stop.set()
        deadline = time.time() + 60.0
        while True:
            with contextlib.suppress(queue.Empty):
                while True:
                    self._queue.get_nowait()
            self._thread.join(timeout=2)
            if not self._thread.is_alive():
                self._reader.close()
                return
            if time.time() >= deadline:
                return

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def combine_scene_videos(videos, audio_meta, fps: float = 25.0,
                         index: int = 0, total_sets: int = 1,
                         groups_in_last_set: int = 16,
                         pad_short: bool = False) -> np.ndarray:
    """Trim each scene clip to its audio-metered duration and
    concatenate along the frame axis — the HuMo set combiner
    (``/root/reference/HumoAutomation.py:892-1037``, CombinevideosV3;
    ``:50-134``, V2).

    ``videos`` is an ordered list of BHWC frame batches (``None`` slots
    allowed, up to 16 per set). ``audio_meta`` carries ``durations``
    (seconds) or ``durations_frames``; a missing/zero duration keeps the
    clip's own length under ``pad_short`` (V2) and trims to a 1-frame
    placeholder otherwise (V3). On the final set (``index ==
    total_sets - 1``) slots beyond ``groups_in_last_set`` are skipped.
    ``pad_short`` repeats the last frame up to the target (the V2
    behavior; V3 leaves short renders as-is so generation shortfalls
    stay visible).
    """
    scene_cap = 16
    if not isinstance(audio_meta, dict):
        raise ValueError("audio_meta must be a dict")
    durations = audio_meta.get("durations_frames")
    in_frames = durations is not None
    if durations is None:
        durations = audio_meta.get("durations")
    if durations is None:
        raise ValueError(
            "audio_meta missing 'durations' or 'durations_frames' list")
    durations = list(durations)[:scene_cap]
    durations += [0.0] * (scene_cap - len(durations))

    last_run = int(index) == int(total_sets) - 1
    limit = scene_cap
    if last_run:
        limit = max(1, min(int(groups_in_last_set), scene_cap))

    pieces = []
    for slot, video in enumerate(list(videos)[:limit], start=1):
        if video is None:
            continue
        video = np.asarray(video)
        if video.ndim != 4:
            raise ValueError(
                f"video_{slot} must have shape (frames,H,W,C), got "
                f"{tuple(video.shape)}")
        value = float(durations[slot - 1])
        if value > 0:
            target = max(1, int(round(value if in_frames
                                      else value * float(fps))))
        elif pad_short:
            # V2: a zero/missing duration keeps the clip's own length
            target = video.shape[0]
        else:
            # V3: max(1, round(0)) — a 1-frame placeholder keeps the
            # set's frame count tracking the audio meta (:917-930)
            target = 1
        if video.shape[0] > target:
            video = video[:target]
        elif video.shape[0] < target and pad_short:
            repeat = np.repeat(video[-1:], target - video.shape[0],
                               axis=0)
            video = np.concatenate([video, repeat], axis=0)
        pieces.append(video.astype(np.float32, copy=False))
    if not pieces:
        raise ValueError("No video inputs detected. Provide at least "
                         "one scene clip.")
    return np.concatenate(pieces, axis=0)


def list_final_set_videos(folder: str) -> list[str]:
    """The rendered set finals in a HuMo output folder — sorted
    ``*-audio.mp4`` files (``HumoAutomation.py:236-241,2575-2581``)."""
    if not os.path.isdir(folder):
        return []
    return sorted(name for name in os.listdir(folder)
                  if name.lower().endswith(".mp4")
                  and "-audio" in name.lower())


def assemble_final_video(folder: str, audio=None, threshold: int = 3,
                         output_name: str = "FINAL_VIDEO.mp4",
                         redo: bool = False) -> dict:
    """Threshold-gated final assembly (``HumoAutomation.py:2548-2663``,
    VRGDG_CreateFinalVideo; SRT/redo variant ``:2673-2880``): once at
    least ``threshold`` set finals exist in ``folder``, concatenate
    them and lay the original clean audio underneath.

    ``redo=True`` is the SRT variant's rerun mode: the threshold gate
    is bypassed, the output becomes ``FINAL_VIDEO_REDO.mp4``, and a
    non-empty ``vrgdg_temp/vrgdg_override_queue.json`` defers assembly
    until the queued group reruns drain.  In both modes an existing
    output is never overwritten — a numbered sibling is chosen
    (``:2751-2760``).

    The reference shells out to ffmpeg twice (stream-copy concat, then
    aac mux); here :func:`concat_videos` provides the same ffmpeg path
    plus the native stream-copy / cv2 degradations this image needs.
    Returns ``{skipped, count, output, backend, audio}``.
    """
    videos = list_final_set_videos(folder)
    if redo:
        output_name = "FINAL_VIDEO_REDO.mp4"
        override_path = os.path.join(folder, "vrgdg_temp",
                                     "vrgdg_override_queue.json")
        if os.path.isfile(override_path):
            import json as _json

            with open(override_path, "r", encoding="utf-8") as handle:
                remaining = _json.load(handle)
            if remaining:
                return {"skipped": True, "count": len(videos),
                        "threshold": int(threshold), "output": "",
                        "backend": "", "audio": False,
                        "waiting_for": remaining}
    elif len(videos) < threshold:
        return {"skipped": True, "count": len(videos),
                "threshold": int(threshold), "output": "",
                "backend": "", "audio": False}
    if not videos:
        return {"skipped": True, "count": 0,
                "threshold": int(threshold), "output": "",
                "backend": "", "audio": False}

    base, ext = os.path.splitext(output_name)
    suffix = 2
    while os.path.exists(os.path.join(folder, output_name)):
        output_name = f"{base}{suffix}{ext}"
        suffix += 1

    first = probe_video(os.path.join(folder, videos[0]))
    audio_path = None
    if audio is not None:
        from .audio_toolkit import save_wav

        audio_path = os.path.join(folder, "_original_audio.wav")
        save_wav(audio_path, audio)
    output_path = os.path.join(folder, output_name)
    try:
        result = concat_videos(
            [os.path.join(folder, name) for name in videos],
            output_path, first["fps"], first["width"],
            first["height"], source_audio_path=audio_path)
    finally:
        if audio_path:
            with contextlib.suppress(OSError):
                os.remove(audio_path)
    return {"skipped": False, "count": len(videos),
            "threshold": int(threshold), "output": output_path,
            "backend": result["backend"], "audio": result["audio"]}


GRID_LABEL_BAND = 40
_GRID_VIDEO_EXTENSIONS = {".mp4", ".mov", ".mkv", ".webm", ".avi"}


def find_grid_videos(folder: str) -> list[str]:
    """Videos eligible for a comparison grid, sorted by (lowercased
    name, mtime, path); prior grid/XYZ outputs excluded
    (``LTXLoraTrain.py:7992-8006``)."""
    matches = []
    for entry in os.scandir(folder):
        if not entry.is_file():
            continue
        if os.path.splitext(entry.name)[1].lower() \
                not in _GRID_VIDEO_EXTENSIONS:
            continue
        upper = entry.name.upper()
        if "_XYZ_COMPARE_" in upper or "_VIDEOGRID_" in upper:
            continue
        matches.append((entry.name.lower(), entry.stat().st_mtime,
                        entry.path))
    matches.sort()
    return [os.path.normpath(path) for _, _, path in matches]


def _fit_grid_tile(frame_bgr, cell_width, cell_height, label_text,
                   band_height):
    """Letterbox one frame into a labeled tile (``LTXLoraTrain.py:
    8062-8089``): aspect-preserving INTER_AREA downfit, centered, with
    a centered white caption in the label band."""
    import cv2

    canvas = np.zeros((int(cell_height), int(cell_width), 3), np.uint8)
    content_height = max(16, int(cell_height) - int(band_height))
    frame_height, frame_width = frame_bgr.shape[:2]
    scale = min(float(cell_width) / max(1, frame_width),
                float(content_height) / max(1, frame_height))
    new_width = max(1, int(round(frame_width * scale)))
    new_height = max(1, int(round(frame_height * scale)))
    resized = cv2.resize(frame_bgr, (new_width, new_height),
                         interpolation=cv2.INTER_AREA)
    x0 = max(0, (int(cell_width) - new_width) // 2)
    y0 = int(band_height) + max(0, (content_height - new_height) // 2)
    canvas[y0:y0 + new_height, x0:x0 + new_width] = resized

    if band_height:
        font = cv2.FONT_HERSHEY_SIMPLEX
        font_scale = max(0.45, min(1.0, float(cell_width) / 420.0))
        text = str(label_text or "")
        (text_w, text_h), baseline = cv2.getTextSize(text, font,
                                                     font_scale, 2)
        cv2.putText(canvas, text,
                    (max(8, (int(cell_width) - text_w) // 2),
                     max(text_h + 6,
                         (int(band_height) + text_h) // 2 - baseline)),
                    font, font_scale, (255, 255, 255), 2, cv2.LINE_AA)
    return canvas


def render_video_grid(sources, labels=None, cell_width: int = 0,
                      cell_height: int = 0,
                      label_tiles: bool = True) -> np.ndarray:
    """Labeled comparison grid of N videos — the review tool the
    reference buries in its trainer module
    (``LTXLoraTrain.py:7926-8316``, VRGDG_VideoFolderGridPlot).

    ``sources`` is a list of video paths or of (frames, H, W, 3) float
    [0,1] arrays (mixable).  Columns = ⌈√N⌉; the cell auto-sizes from
    the first source (+40 px label band).  Paths stream frame-by-frame
    holding each video's last frame until the longest ends; array
    sources clamp their final frame the same way.  Returns (frames,
    rows*cell_h, cols*cell_w, 3) float32 RGB.
    """
    import cv2

    if not sources:
        raise ValueError("render_video_grid needs at least one source")
    band = GRID_LABEL_BAND if label_tiles else 0
    labels = list(labels or [])
    labels += [""] * (len(sources) - len(labels))

    def _first_resolution(source):
        if isinstance(source, str):
            probe = probe_video(source)
            return probe["width"], probe["height"]
        array = np.asarray(source)
        return int(array.shape[-2]), int(array.shape[-3])

    if not (cell_width > 0 and cell_height > 0):
        width0, height0 = _first_resolution(sources[0])
        cell_width = int(cell_width) if cell_width > 0 else width0
        cell_height = int(cell_height) if cell_height > 0 \
            else height0 + band
    columns = max(1, math.ceil(math.sqrt(len(sources))))
    rows = math.ceil(len(sources) / columns)

    resolved_labels = []
    for index, source in enumerate(sources):
        fallback = os.path.splitext(os.path.basename(source))[0] \
            if isinstance(source, str) else f"video{index + 1}"
        resolved_labels.append(str(labels[index]).strip() or fallback)

    readers = []
    try:
        for source in sources:
            if isinstance(source, str):
                capture = cv2.VideoCapture(source)
                if not capture.isOpened():
                    raise RuntimeError(
                        f"Could not open video for grid render: "
                        f"{source}")
                readers.append({"capture": capture, "last": None,
                                "done": False})
            else:
                array = np.asarray(source)
                if array.ndim == 3:
                    array = array[None]
                readers.append({"frames": array, "cursor": 0})

        output = []
        blank = np.zeros((max(16, cell_height - band), cell_width, 3),
                         np.uint8)
        while True:
            fresh = False
            tiles = []
            for reader in readers:
                if "capture" in reader:
                    frame = None
                    if not reader["done"]:
                        ok, read = reader["capture"].read()
                        if ok and read is not None:
                            frame = reader["last"] = read
                            fresh = True
                        else:
                            reader["done"] = True
                    if frame is None:
                        frame = reader["last"] if reader["last"] \
                            is not None else blank
                else:
                    frames = reader["frames"]
                    source_index = min(reader["cursor"],
                                       frames.shape[0] - 1)
                    if reader["cursor"] < frames.shape[0]:
                        fresh = True
                    reader["cursor"] += 1
                    rgb = np.clip(np.asarray(frames[source_index])
                                  * 255.0, 0, 255).astype(np.uint8)
                    frame = cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR)
                tiles.append(frame)
            if not fresh:
                break
            grid = np.zeros((rows * cell_height, columns * cell_width,
                             3), np.uint8)
            for index, frame in enumerate(tiles):
                tile = _fit_grid_tile(frame, cell_width, cell_height,
                                      resolved_labels[index], band)
                row, col = divmod(index, columns)
                grid[row * cell_height:(row + 1) * cell_height,
                     col * cell_width:(col + 1) * cell_width] = tile
            output.append(cv2.cvtColor(grid, cv2.COLOR_BGR2RGB)
                          .astype(np.float32) / 255.0)
    finally:
        for reader in readers:
            if "capture" in reader:
                reader["capture"].release()
    if not output:
        raise RuntimeError("No grid frames could be created from the "
                           "provided sources.")
    return np.stack(output)


def add_label_bar(frames, label_text: str) -> np.ndarray:
    """Append a black 60-px bar with a centered white label under each
    frame — the V5 combiner's review-copy annotation
    (``/root/reference/HumoAutomationExtra2.py:360-391``).

    ``frames`` is float RGB in [0,1], shape (N,H,W,3); the result is
    (N,H+60,W,3) float32.  Text metrics match the reference (Hershey
    simplex, scale 1.0, thickness 2, anti-aliased, baseline at 70% of
    the bar) so labeled review videos render identically.
    """
    import cv2

    frames = np.asarray(frames)
    if frames.ndim != 4 or frames.shape[-1] != 3:
        raise ValueError(f"expected (N,H,W,3) RGB frames, got "
                         f"{tuple(frames.shape)}")
    bar_height = 60
    text = str(label_text)
    out = []
    for frame in frames:
        rgb = (np.asarray(frame) * 255).astype(np.uint8)
        height, width = rgb.shape[:2]
        canvas = np.zeros((height + bar_height, width, 3), np.uint8)
        canvas[:height] = cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR)
        (text_w, _), _ = cv2.getTextSize(
            text, cv2.FONT_HERSHEY_SIMPLEX, 1.0, 2)
        cv2.putText(canvas, text,
                    ((width - text_w) // 2,
                     height + int(bar_height * 0.7)),
                    cv2.FONT_HERSHEY_SIMPLEX, 1.0, (255, 255, 255), 2,
                    cv2.LINE_AA)
        out.append(cv2.cvtColor(canvas, cv2.COLOR_BGR2RGB)
                   .astype(np.float32) / 255.0)
    return np.stack(out)


def save_labeled_set_video(videos, audio_meta, folder: str,
                           fps: float = 25.0, index: int = 0,
                           total_sets: int = 1,
                           groups_in_last_set: int = 16) -> str:
    """Write the V5 combiner's labeled review sidecar
    (``/root/reference/HumoAutomationExtra2.py:479-493``): each scene
    clip trimmed to its audio-metered duration, annotated
    ``set N - group M``, concatenated, and saved as
    ``<folder>/WithLabels/set{N}_combined.mp4``.  Returns the output
    path.  The clean (unlabeled) frames come from
    :func:`combine_scene_videos` as before — the labeled copy is a
    review artifact only.
    """
    import cv2

    scene_cap = 16
    last_run = int(index) == int(total_sets) - 1
    limit = scene_cap
    if last_run:
        limit = max(1, min(int(groups_in_last_set), scene_cap))
    labeled = [(slot, video) for slot, video
               in enumerate(list(videos)[:limit], start=1)
               if video is not None]
    if not labeled:
        raise ValueError("No video inputs detected.")

    durations = audio_meta.get("durations_frames")
    in_frames = durations is not None
    if durations is None:
        durations = audio_meta.get("durations")
    if durations is None:
        raise ValueError(
            "audio_meta missing 'durations' or 'durations_frames'")
    durations = list(durations)[:scene_cap]
    durations += [0.0] * (scene_cap - len(durations))

    pieces = []
    for slot, video in labeled:
        video = np.asarray(video)
        value = float(durations[slot - 1])
        target = max(1, int(round(value if in_frames
                                  else value * float(fps))))
        if video.shape[0] > target:
            video = video[:target]
        pieces.append(add_label_bar(
            video, f"set {index + 1} - group {slot}"))

    frames = np.concatenate(pieces, axis=0)
    out_dir = os.path.join(folder, "WithLabels")
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, f"set{index + 1}_combined.mp4")
    height, width = frames.shape[1:3]
    writer = cv2.VideoWriter(out_path,
                             cv2.VideoWriter_fourcc(*"mp4v"),
                             float(fps), (width, height))
    try:
        for frame in frames:
            writer.write(cv2.cvtColor(
                (frame * 255).astype(np.uint8), cv2.COLOR_RGB2BGR))
    finally:
        writer.release()
    return out_path
