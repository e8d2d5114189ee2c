"""Compare appliers: render A/B comparison media to disk.

The reference's compare nodes are browser widgets
(``VRGDG_ImageCompareNode.py:11-34``, ``VRGDG_VideoCompareNode.py:9-46``
resolves VHS filename tuples against the output/temp/input roots); here
the five modes render to actual files via :mod:`vrgdg_tpu.ops.compare`
so the CLI/API can produce side-by-side/slider/overlay/difference/blink
images and clips for parity debugging.
"""

from __future__ import annotations

import os
import time

import numpy as np

from ..ops.compare import MODES, render_compare
from ..runtime import video_io
from . import paths
from .appliers import device_name, ffmpeg_browser_encode, _write_thumbnail


def _default_output(path_a: str, mode: str, ext: str) -> str:
    stem = os.path.splitext(path_a)[0]
    return f"{stem}_compare_{mode}{ext}"


def compare_images(input_a, input_b, mode: str = "slider", output_path="",
                   slider_position: float = 0.5, overlay_opacity: float = 0.5,
                   difference_gain: float = 1.0) -> dict:
    """Render one comparison image from two input images."""
    from PIL import Image

    import jax.numpy as jnp

    path_a = paths.resolve_media_path(input_a, "Compare input A")
    path_b = paths.resolve_media_path(input_b, "Compare input B")
    mode = str(mode or "slider").lower()
    if mode not in MODES:
        raise ValueError(f"Unknown compare mode '{mode}'. Use one of {MODES}.")
    output_path = os.path.abspath(
        str(output_path or "").strip().strip('"')
        or _default_output(path_a, mode, ".png"))
    os.makedirs(os.path.dirname(output_path), exist_ok=True)

    started = time.perf_counter()

    def load(path):
        with Image.open(path) as image:
            return jnp.asarray(
                np.asarray(image.convert("RGB"), np.float32)[None] / 255.0)

    a, b = load(path_a), load(path_b)
    # blink has no single-image rendering: fall back to side_by_side
    render_mode = "side_by_side" if mode == "blink" else mode
    out = render_compare(a, b, render_mode,
                         slider_position=slider_position,
                         overlay_opacity=overlay_opacity,
                         difference_gain=difference_gain)
    u8 = np.clip(np.asarray(out)[0] * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(u8, mode="RGB").save(output_path)
    return {
        "input_a": path_a,
        "input_b": path_b,
        "mode": mode,
        "output": output_path,
        "device": device_name(),
        "width": int(u8.shape[1]),
        "height": int(u8.shape[0]),
        "elapsed_seconds": time.perf_counter() - started,
    }


def compare_videos(input_a, input_b, mode: str = "slider", output_path="",
                   slider_position: float = 0.5, overlay_opacity: float = 0.5,
                   difference_gain: float = 1.0, blink_speed: float = 1.0,
                   batch_size: int = 8, encode_crf: int = 23,
                   encode_preset: str = "medium") -> dict:
    """Render one comparison clip from two input videos (frame-paired,
    truncated to the shorter input)."""
    import jax.numpy as jnp

    path_a = video_io.normalize_video_path(input_a)
    path_b = video_io.normalize_video_path(input_b)
    mode = str(mode or "slider").lower()
    if mode not in MODES:
        raise ValueError(f"Unknown compare mode '{mode}'. Use one of {MODES}.")
    output_path = os.path.abspath(
        str(output_path or "").strip().strip('"')
        or _default_output(path_a, mode, ".mp4"))
    os.makedirs(os.path.dirname(output_path), exist_ok=True)

    meta_a = video_io.probe_video(path_a)
    meta_b = video_io.probe_video(path_b)
    fps = meta_a["fps"]
    frame_count = min(meta_a["frame_count"], meta_b["frame_count"])
    started = time.perf_counter()
    counters = {"frames": 0}

    # output geometry is analytic (B letterboxes onto A's geometry):
    # side_by_side adds B's width plus the 2px separator
    out_h = int(meta_a["height"])
    out_w = int(meta_a["width"]) * 2 + 2 if mode == "side_by_side" \
        else int(meta_a["width"])

    def producer():
        counters["frames"] = 0
        reader_a = video_io.VideoReader(path_a, batch_size=batch_size,
                                        end_frame=frame_count)
        reader_b = video_io.VideoReader(path_b, batch_size=batch_size,
                                        end_frame=frame_count)
        with reader_a, reader_b:
            for (start_a, batch_a), (_, batch_b) in zip(iter(reader_a),
                                                        iter(reader_b)):
                count = min(batch_a.shape[0], batch_b.shape[0])
                # pad short tail batches to the stable shape (repeat the
                # last frame; trimmed after) so the render compiles once
                # per video instead of once per tail shape
                pad = batch_size - count
                a = batch_a[:count]
                b = batch_b[:count]
                if pad > 0:
                    a = np.concatenate([a, np.repeat(a[-1:], pad, axis=0)])
                    b = np.concatenate([b, np.repeat(b[-1:], pad, axis=0)])
                out = render_compare(
                    jnp.asarray(a), jnp.asarray(b),
                    mode, slider_position=slider_position,
                    overlay_opacity=overlay_opacity,
                    difference_gain=difference_gain, fps=fps,
                    blink_speed=blink_speed, frame_start=start_a)
                counters["frames"] += count
                yield np.asarray(
                    video_io.quantize_on_device(out))[:count]

    codec = video_io.write_video_with_fallback(output_path, fps, out_w,
                                               out_h, producer)
    ffmpeg_result = ffmpeg_browser_encode(output_path, "", encode_crf,
                                          encode_preset)
    elapsed = time.perf_counter() - started
    return {
        "input_a": path_a,
        "input_b": path_b,
        "mode": mode,
        "output": output_path,
        "device": device_name(),
        "width": out_w,
        "height": out_h,
        "fps": fps,
        "processed_frames": counters["frames"],
        "elapsed_seconds": elapsed,
        "processed_fps": counters["frames"] / elapsed if elapsed else 0.0,
        "encoder": (ffmpeg_result.get("encoder") if ffmpeg_result.get("ok")
                    else f"cv2:{codec}"),
        "browser_friendly": bool(ffmpeg_result.get("ok")),
        "thumbnail_path": _write_thumbnail(output_path),
    }
