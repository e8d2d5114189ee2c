"""Feathered paste-back and face composites.

Three mask/composite variants exist in the reference and all are
reproduced here (SURVEY.md §2.1):

1. :func:`soft_blend_mask` + :func:`paste_back` — rect/ellipse inset+feather
   distance fields, mean-shift color match over ``alpha > 0.25``, bicubic
   crop resize, optional user mask (``VRGDG_ImagePasteBack.py:11-41,
   209-262``),
2. :func:`radial_face_composite` — the Standalone Face Fix radial variant:
   ``1 - sqrt(xx^2 + yy^2)`` alpha scaled by a feather ratio, per-entry
   strength, color match over ``alpha > 0.35``, ±7-frame LTX tolerance
   (``VRGDG_StandaloneFaceFixNodes.py:590-631``),
3. :func:`soft_ellipse_mask` — the cv2 twin: filled ellipse with a 3.5%
   inset, Gaussian-blur feather with kernel ``max(3, 4*feather+1)`` and
   sigma ``max(0.1, feather)`` (``VRGDG_FaceFix.py:880-894``), built here
   analytically with a separable Gaussian instead of cv2 rasterization.

Crop rectangles are Python ints (host-side geometry), so the per-frame
composites run as small jitted regions pasted back on the host — these are
UI-scale ops, not the bulk video path.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .resize import resample

CROP_DATA = tuple  # WAS-compatible: ((width, height), (left, top, right, bottom))


def soft_blend_mask(height: int, width: int, inset: float, feather: float,
                    shape: str = "ellipse") -> jnp.ndarray:
    """Soft alpha mask from an inset + feather distance field
    (``VRGDG_ImagePasteBack.py:11-30``)."""
    yy = jnp.arange(height, dtype=jnp.float32).reshape(height, 1)
    xx = jnp.arange(width, dtype=jnp.float32).reshape(1, width)
    inset = max(0.0, min(float(inset), (min(width, height) - 1) / 2.0))

    if shape == "ellipse":
        cx, cy = (width - 1) / 2.0, (height - 1) / 2.0
        rx, ry = max(0.5, cx - inset), max(0.5, cy - inset)
        distance = 1.0 - jnp.sqrt(((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2)
        distance = distance * min(rx, ry)  # normalized -> ~pixel distance
    else:
        distance = jnp.minimum(
            jnp.minimum(xx - inset, (width - 1 - inset) - xx),
            jnp.minimum(yy - inset, (height - 1 - inset) - yy))

    if feather <= 0:
        return (distance >= 0).astype(jnp.float32)
    return jnp.clip(distance / float(feather), 0.0, 1.0)


def mean_shift_color_match(source: jnp.ndarray, target: jnp.ndarray,
                           alpha: jnp.ndarray, strength: float,
                           threshold: float = 0.25,
                           min_pixels: int = 16) -> jnp.ndarray:
    """Shift the source's mean toward the target over the blended region
    (``VRGDG_ImagePasteBack.py:33-41``); a no-op when fewer than
    ``min_pixels`` pixels pass the alpha threshold."""
    if strength <= 0:
        return source
    selected = (alpha[..., 0] if alpha.ndim == 3 else alpha) > threshold
    count = jnp.sum(selected)
    weight = selected.astype(source.dtype)[..., None]
    denom = jnp.maximum(count.astype(source.dtype), 1.0)
    src_mean = jnp.sum(source * weight, axis=(0, 1)) / denom
    dst_mean = jnp.sum(target * weight, axis=(0, 1)) / denom
    shifted = jnp.clip(source + (dst_mean - src_mean) * float(strength),
                       0.0, 1.0)
    return jnp.where(count >= min_pixels, shifted, source)


def _batch_item(tensor: jnp.ndarray, index: int) -> jnp.ndarray:
    return tensor[min(index, tensor.shape[0] - 1)]


def paste_back(original_image: jnp.ndarray, enhanced_crop: jnp.ndarray,
               crop_data, inset_padding: int = 8, feather_strength: int = 24,
               blend_shape: str = "ellipse", color_match: float = 0.65,
               mask: jnp.ndarray | None = None
               ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Resize an enhanced crop back into its original rectangle with a
    feathered blend (``VRGDG_ImagePasteBack.py:209-262``).

    Returns ``(composited_batch, blend_mask_batch)``.
    """
    if not crop_data:
        raise ValueError(
            "No valid CROP_DATA. Provide ((w, h), (left, top, right, bottom)).")
    try:
        _original_size, box = crop_data
        x, y, right_edge, bottom_edge = (int(v) for v in box)
        crop_w, crop_h = right_edge - x, bottom_edge - y
    except (TypeError, ValueError) as exc:
        raise ValueError("Unsupported CROP_DATA format.") from exc
    if crop_w <= 0 or crop_h <= 0:
        raise ValueError(f"Invalid crop rectangle in CROP_DATA: {box!r}")

    batch = max(original_image.shape[0], enhanced_crop.shape[0],
                mask.shape[0] if mask is not None else 1)
    outputs, masks = [], []
    for index in range(batch):
        original = _batch_item(original_image, index)
        height, width = int(original.shape[0]), int(original.shape[1])
        left, top = min(x, width), min(y, height)
        right = min(left + crop_w, width)
        bottom = min(top + crop_h, height)
        paste_w, paste_h = right - left, bottom - top
        full_mask = jnp.zeros((height, width), original.dtype)
        if paste_w <= 0 or paste_h <= 0:
            outputs.append(original)
            masks.append(full_mask)
            continue

        crop = _batch_item(enhanced_crop, index).astype(original.dtype)
        crop = resample(crop[None], crop_h, crop_w, "bicubic")[0]
        crop = crop[:paste_h, :paste_w, :original.shape[2]]

        alpha = soft_blend_mask(crop_h, crop_w, inset_padding,
                                feather_strength, blend_shape)
        alpha = alpha[:paste_h, :paste_w]
        if mask is not None:
            user = _batch_item(mask, index).astype(original.dtype)
            if user.ndim == 3:
                user = user[..., 0]
            user = resample(user[None, :, :, None], crop_h, crop_w,
                            "bilinear")[0, :, :, 0]
            alpha = alpha * jnp.clip(user[:paste_h, :paste_w], 0.0, 1.0)

        alpha3 = alpha[..., None]
        target = original[top:bottom, left:right, :crop.shape[2]]
        crop = mean_shift_color_match(crop, target, alpha3, color_match)
        blended = target * (1.0 - alpha3) + crop * alpha3
        out = original.at[top:bottom, left:right, :crop.shape[2]].set(blended)
        outputs.append(jnp.clip(out, 0.0, 1.0))
        masks.append(full_mask.at[top:bottom, left:right].set(alpha))
    return jnp.stack(outputs), jnp.stack(masks)


def radial_face_composite(face_frames: jnp.ndarray, originals: jnp.ndarray,
                          entries: list[dict], feather_pixels: int = 18,
                          color_match: float = 0.65
                          ) -> tuple[jnp.ndarray, jnp.ndarray, int]:
    """Feather repaired face crops back into the original frames
    (``VRGDG_StandaloneFaceFixNodes.py:590-631``).

    ``entries[i]`` is ``{"box": (l, t, r, b) or None, "strength": float}``
    per source frame; frames without a box (no safe face) and LTX tail
    drift up to ±7 frames pass through untouched.  Returns
    ``(frames, masks, repaired_count)``.
    """
    delta = len(entries) - int(face_frames.shape[0])
    if abs(delta) > 7:
        raise ValueError(
            f"The model returned {face_frames.shape[0]} frames for "
            f"{len(entries)} source frames.")
    output = originals
    masks = jnp.zeros(originals.shape[:3], originals.dtype)
    repaired = 0
    usable = min(len(entries), int(face_frames.shape[0]))
    for index in range(usable):
        entry = entries[index]
        box = entry.get("box")
        strength = float(entry.get("strength", 0.0))
        if not box or strength <= 0:
            continue
        left, top, right, bottom = (int(v) for v in box)
        h, w = bottom - top, right - left
        face = face_frames[index:index + 1, ..., :3].astype(output.dtype)
        face = jnp.clip(resample(face, h, w, "bicubic")[0], 0.0, 1.0)

        yy = jnp.linspace(-1.0, 1.0, h, dtype=output.dtype)[:, None]
        xx = jnp.linspace(-1.0, 1.0, w, dtype=output.dtype)[None, :]
        radial = 1.0 - jnp.sqrt(xx * xx + yy * yy)
        feather_scale = max(1.0, float(feather_pixels)
                            / max(1.0, min(w, h) / 2.0))
        alpha = jnp.clip(radial / feather_scale, 0.0, 1.0) * strength

        target = output[index, top:bottom, left:right, :3]
        face = mean_shift_color_match(face, target, alpha, color_match,
                                      threshold=0.35)
        blended = target * (1.0 - alpha[..., None]) + face * alpha[..., None]
        output = output.at[index, top:bottom, left:right, :3].set(blended)
        masks = masks.at[index, top:bottom, left:right].set(alpha)
        repaired += 1
    return jnp.clip(output, 0.0, 1.0), masks, repaired


def gaussian_blur(image: jnp.ndarray, kernel_size: int,
                  sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur over the leading two axes of a 2D array,
    cv2-compatible (reflect-101 border, normalized sampled kernel)."""
    kernel_size = int(kernel_size)
    if kernel_size % 2 == 0:
        kernel_size += 1
    half = kernel_size // 2
    x = np.arange(kernel_size, dtype=np.float64) - half
    kernel = np.exp(-(x ** 2) / (2.0 * float(sigma) ** 2))
    kernel = jnp.asarray((kernel / kernel.sum()).astype(np.float32))

    def blur_axis(arr, axis):
        pad = [(0, 0)] * arr.ndim
        pad[axis] = (half, half)
        padded = jnp.pad(arr, pad, mode="reflect")
        out = jnp.zeros_like(arr)
        for i in range(kernel_size):
            sl = [slice(None)] * arr.ndim
            sl[axis] = slice(i, i + arr.shape[axis])
            out = out + padded[tuple(sl)] * kernel[i]
        return out

    return blur_axis(blur_axis(image, 0), 1)


def soft_ellipse_mask(width: int, height: int, feather: int) -> jnp.ndarray:
    """Filled ellipse with a 3.5% inset, feathered by a Gaussian with
    kernel ``max(3, 4*feather+1)`` and sigma ``max(0.1, feather)``
    (``VRGDG_FaceFix.py:880-894``), built analytically."""
    feather = max(0, int(feather))
    inset = max(2, int(round(min(width, height) * 0.035)))
    ax = max(1, width // 2 - inset)
    ay = max(1, height // 2 - inset)
    cx, cy = width // 2, height // 2
    yy = jnp.arange(height, dtype=jnp.float32)[:, None]
    xx = jnp.arange(width, dtype=jnp.float32)[None, :]
    # +0.5 half-pixel bump matches cv2.ellipse's boundary rasterization
    # (measured: 6 vs 70 differing boundary pixels on a 48x40 mask).
    mask = ((((xx - cx) / (ax + 0.5)) ** 2 + ((yy - cy) / (ay + 0.5)) ** 2)
            <= 1.0).astype(jnp.float32)
    if feather > 0:
        kernel = max(3, feather * 4 + 1)
        mask = gaussian_blur(mask, kernel, max(0.1, float(feather)))
    return jnp.clip(mask, 0.0, 1.0)


def ellipse_composite(original: jnp.ndarray, enhanced: jnp.ndarray,
                      crop_box, feather: int = 18, color_match: float = 0.65,
                      composite_strength: float = 1.0) -> jnp.ndarray:
    """Single-frame ellipse composite, the math of the face-fix finalize
    loop (``VRGDG_FaceFix.py:937-957``) on [0,1] float frames: resize the
    repaired crop into the box, ellipse-feather, mean-shift color match
    over ``alpha > 0.35``, fade by ``composite_strength``."""
    left, top, right, bottom = (int(v) for v in crop_box)
    h, w = bottom - top, right - left
    if h <= 0 or w <= 0:
        raise ValueError(f"Invalid crop box: {crop_box!r}")
    resized = jnp.clip(resample(enhanced[None, ..., :3], h, w,
                                "lanczos4")[0], 0.0, 1.0)
    target = original[top:bottom, left:right, :3]
    base_alpha = soft_ellipse_mask(w, h, feather)
    resized = mean_shift_color_match(resized, target, base_alpha,
                                     color_match, threshold=0.35)
    alpha = (base_alpha * max(0.0, min(1.0, float(composite_strength))))[..., None]
    blended = target * (1.0 - alpha) + resized * alpha
    return jnp.clip(original.at[top:bottom, left:right, :3].set(blended),
                    0.0, 1.0)
