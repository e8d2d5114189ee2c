"""Compare renders: the five comparison modes as pixel math.

The reference's compare nodes (``VRGDG_ImageCompareNode.py:11-34``,
``VRGDG_VideoCompareNode.py``) ship both inputs to a browser widget that
renders ``side_by_side / slider / overlay / difference / blink``
client-side with ``slider_position``, ``overlay_opacity``, ``blink_speed``
and ``show_labels`` controls.  Standalone, those renders are produced
here as BHWC [0,1] math so the CLI/API can write actual comparison
media — and so parity debugging has golden-testable frames.

All functions take two same-shaped BHWC [0,1] batches; mismatched inputs
are letterbox-resized to A's geometry first via :func:`align_pair`.
"""

from __future__ import annotations

import jax.numpy as jnp

from .resize import resize_batch

MODES = ("side_by_side", "slider", "overlay", "difference", "blink")


def align_pair(a: jnp.ndarray, b: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Letterbox B onto A's geometry when sizes differ; RGB only."""
    a = a[..., :3]
    b = b[..., :3]
    if a.shape[1:3] != b.shape[1:3]:
        b = resize_batch(b, int(a.shape[2]), int(a.shape[1]),
                         "letterbox", "bicubic")
    count = min(a.shape[0], b.shape[0])
    return a[:count], b[:count]


def side_by_side(a: jnp.ndarray, b: jnp.ndarray,
                 separator: int = 2) -> jnp.ndarray:
    """A | B horizontally with a white separator column."""
    a, b = align_pair(a, b)
    sep = jnp.ones((a.shape[0], a.shape[1], max(0, int(separator)), 3),
                   a.dtype)
    return jnp.concatenate([a, sep, b], axis=2)


def slider(a: jnp.ndarray, b: jnp.ndarray, position: float = 0.5,
           seam: int = 2) -> jnp.ndarray:
    """A left of the slider position, B right of it, with a white seam."""
    a, b = align_pair(a, b)
    width = a.shape[2]
    split = int(round(max(0.0, min(1.0, float(position))) * width))
    column = jnp.arange(width)[None, None, :, None]
    out = jnp.where(column < split, a, b)
    if int(seam) <= 0:
        return out
    half = int(seam) / 2.0
    on_seam = jnp.abs(column + 0.5 - split) <= half
    return jnp.where(on_seam, 1.0, out)


def overlay(a: jnp.ndarray, b: jnp.ndarray,
            opacity: float = 0.5) -> jnp.ndarray:
    """B blended over A at ``opacity``."""
    a, b = align_pair(a, b)
    opacity = max(0.0, min(1.0, float(opacity)))
    return a * (1.0 - opacity) + b * opacity


def difference(a: jnp.ndarray, b: jnp.ndarray,
               gain: float = 1.0) -> jnp.ndarray:
    """Amplified absolute difference: identical inputs render black."""
    a, b = align_pair(a, b)
    return jnp.clip(jnp.abs(a - b) * max(1.0, float(gain)), 0.0, 1.0)


def blink_period(fps: float, blink_speed: float) -> int:
    """Frames per blink toggle at ``blink_speed`` Hz (clamped 0.1..8.0,
    the widget's control range)."""
    speed = max(0.1, min(8.0, float(blink_speed)))
    return max(1, int(round(float(fps) / speed)))


def blink(a: jnp.ndarray, b: jnp.ndarray, fps: float = 24.0,
          blink_speed: float = 1.0, frame_start: int = 0) -> jnp.ndarray:
    """Per-frame A/B alternation for a batch starting at absolute frame
    ``frame_start`` — batch-boundary invariant like every other op here."""
    a, b = align_pair(a, b)
    period = blink_period(fps, blink_speed)
    index = frame_start + jnp.arange(a.shape[0])
    show_a = ((index // period) % 2 == 0)[:, None, None, None]
    return jnp.where(show_a, a, b)


def render_compare(a: jnp.ndarray, b: jnp.ndarray, mode: str, *,
                   slider_position: float = 0.5, overlay_opacity: float = 0.5,
                   difference_gain: float = 1.0, fps: float = 24.0,
                   blink_speed: float = 1.0,
                   frame_start: int = 0) -> jnp.ndarray:
    mode = str(mode or "slider").lower()
    if mode == "side_by_side":
        return side_by_side(a, b)
    if mode == "slider":
        return slider(a, b, slider_position)
    if mode == "overlay":
        return overlay(a, b, overlay_opacity)
    if mode == "difference":
        return difference(a, b, difference_gain)
    if mode == "blink":
        return blink(a, b, fps, blink_speed, frame_start)
    raise ValueError(f"Unknown compare mode '{mode}'. Use one of {MODES}.")
