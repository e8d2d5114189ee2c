"""The 13-slider adjust stack.

Reference math: ``VRGDG_LUTVideoTools.py:307-391`` (``_apply_adjust_tensor``)
applied in this fixed order on clamped [0,1] BHWC frames:

1. temperature/tint RGB offset vector,
2. exposure ``x * 2^(e/100)``,
3. contrast ``(x - 0.5) * (1 + c/100) + 0.5``,
4. saturation via Rec.709-luma lerp,
5. highlights/shadows (luma masks over the 0.55/0.45 shoulders, /220) and
   whites/blacks (0.75/0.25 shoulders, /240),
6. clarity: 9-tap reflect-padded box-blur detail * 1.55 * midtone mask,
7. sharpen: 3-tap replicate-padded box-blur fine detail * 5.0,
8. fade ``x * (1 - f*0.35) + f*0.18``,
9. radial vignette ``1 - clamp((d - 0.35)/1.05) * v * 0.75``.

``settings`` is treated as **static** under jit: XLA dead-code-eliminates
the sliders at zero, so a clip graded with three active sliders pays only
for those three.  Box blurs are separable two-pass shifted sums — pure VPU
work that XLA fuses per tile.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.colorspace import rec709_luma
from ..core.params import AdjustSettings


def _box_blur(frames: jnp.ndarray, kernel: int, pad_mode: str) -> jnp.ndarray:
    """Separable k x k mean filter, stride 1, with the given jnp.pad mode
    ("reflect" = torch reflect, "edge" = torch replicate)."""
    pad = kernel // 2
    p = jnp.pad(frames, ((0, 0), (pad, pad), (0, 0), (0, 0)), mode=pad_mode)
    h = frames.shape[1]
    rows = sum(p[:, i:i + h] for i in range(kernel)) / kernel
    p = jnp.pad(rows, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode=pad_mode)
    w = frames.shape[2]
    return sum(p[:, :, i:i + w] for i in range(kernel)) / kernel


def _clarity_kernel(height: int, width: int, target: int = 9) -> int:
    """The reference's odd-kernel shrink for small frames
    (``VRGDG_LUTVideoTools.py:352-355``)."""
    k = min(int(target),
            height if height % 2 else height - 1,
            width if width % 2 else width - 1)
    return k


def apply_adjust(frames: jnp.ndarray, settings: AdjustSettings) -> jnp.ndarray:
    """Apply the full adjust stack to a BHWC [0,1] batch.

    ``settings`` must be an :class:`AdjustSettings` (hashable, safe to mark
    static under ``jax.jit``).
    """
    out = jnp.clip(frames, 0.0, 1.0)
    if not settings.enabled or settings.is_identity:
        return out

    s = settings
    if s.temperature != 0.0 or s.tint != 0.0:
        offset = jnp.asarray(
            [s.temperature / 400.0 - s.tint / 900.0,
             s.tint / 450.0,
             -s.temperature / 400.0 - s.tint / 900.0], out.dtype)
        out = out + offset

    if s.exposure != 0.0:
        out = out * (2.0 ** (s.exposure / 100.0))
    if s.contrast != 0.0:
        out = (out - 0.5) * (1.0 + s.contrast / 100.0) + 0.5

    if s.saturation != 0.0:
        gray = rec709_luma(out)
        out = gray + (out - gray) * (1.0 + s.saturation / 100.0)

    if s.highlights or s.shadows or s.whites or s.blacks:
        luma = rec709_luma(out)
        if s.highlights:
            out = out + jnp.clip((luma - 0.55) / 0.45, 0.0, 1.0) * (s.highlights / 220.0)
        if s.shadows:
            out = out + jnp.clip((0.45 - luma) / 0.45, 0.0, 1.0) * (s.shadows / 220.0)
        if s.whites:
            out = out + jnp.clip((luma - 0.75) / 0.25, 0.0, 1.0) * (s.whites / 240.0)
        if s.blacks:
            out = out + jnp.clip((0.25 - luma) / 0.25, 0.0, 1.0) * (s.blacks / 240.0)

    clarity = s.clarity / 100.0
    sharpen = s.sharpen / 100.0
    height, width = int(frames.shape[1]), int(frames.shape[2])
    if abs(clarity) > 0.001:
        k = _clarity_kernel(height, width)
        if k >= 3:
            detail = out - _box_blur(out, k, "reflect")
            luma = rec709_luma(out)
            midtone = 1.0 - jnp.clip(jnp.abs(luma - 0.5) / 0.5, 0.0, 1.0)
            out = out + detail * clarity * 1.55 * (0.35 + midtone * 0.65)
    if sharpen > 0.001:
        fine = out - _box_blur(out, 3, "edge")
        out = out + fine * sharpen * 5.0

    fade = s.fade / 100.0
    if fade > 0.0:
        out = out * (1.0 - fade * 0.35) + fade * 0.18

    vignette = s.vignette / 100.0
    if vignette > 0.0:
        yy = jnp.linspace(-1.0, 1.0, height, dtype=out.dtype).reshape(1, height, 1, 1)
        xx = jnp.linspace(-1.0, 1.0, width, dtype=out.dtype).reshape(1, 1, width, 1)
        distance = jnp.sqrt(xx * xx + yy * yy)
        mask = 1.0 - jnp.clip((distance - 0.35) / 1.05, 0.0, 1.0) * vignette * 0.75
        out = out * mask

    return jnp.clip(out, 0.0, 1.0)
