"""LAB mean/std color transfer toward a reference image.

Reference math (``nodes.py:91-124``): both image and reference are converted
to CIELAB; per-channel spatial mean and (unbiased) std are computed over
H,W with a 1e-5 std floor offset; the image statistics are re-targeted,
``matched = (img - mu_img) / sigma_img * sigma_ref + mu_ref``; the match is
linearly blended by ``match_strength``; the result converts back to RGB and
clamps.

Statistics use ``ddof=1`` to match ``torch.std``'s unbiased default.  The
spatial reductions are exposed separately (:func:`lab_statistics`) so the
sharded path can compute them with ``psum`` when a frame's spatial axes
live on different devices.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.colorspace import lab_to_rgb, rgb_to_lab


def lab_statistics(rgb: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-image LAB channel mean/std over the spatial axes of a BHWC batch.

    Returns ``(mean, std)`` each shaped ``(B, 1, 1, 3)``; std is unbiased
    (ddof=1) plus the reference's 1e-5 floor offset (``nodes.py:100``).
    """
    lab = rgb_to_lab(rgb[..., :3])
    mean = jnp.mean(lab, axis=(1, 2), keepdims=True)
    var = jnp.var(lab, axis=(1, 2), keepdims=True, ddof=1)
    return mean, jnp.sqrt(var) + 1e-5


def transfer_lab_statistics(images: jnp.ndarray,
                            ref_mean: jnp.ndarray, ref_std: jnp.ndarray,
                            match_strength) -> jnp.ndarray:
    """Re-target a BHWC batch onto precomputed reference LAB statistics."""
    lab = rgb_to_lab(images[..., :3])
    mean = jnp.mean(lab, axis=(1, 2), keepdims=True)
    std = jnp.sqrt(jnp.var(lab, axis=(1, 2), keepdims=True, ddof=1)) + 1e-5
    matched = (lab - mean) / std * ref_std + ref_mean
    blended = match_strength * matched + (1.0 - match_strength) * lab
    rgb = jnp.clip(lab_to_rgb(blended), 0.0, 1.0)
    if images.shape[-1] > 3:
        return images.at[..., :3].set(rgb.astype(images.dtype))
    return rgb.astype(images.dtype)


def color_match(images: jnp.ndarray, reference: jnp.ndarray,
                match_strength=1.0) -> jnp.ndarray:
    """Match a BHWC batch's color tone to a reference image batch.

    Reference statistics are per-reference-frame; a single-frame reference
    broadcasts across the whole batch (the common node usage).
    """
    ref_mean, ref_std = lab_statistics(reference)
    return transfer_lab_statistics(images, ref_mean, ref_std, match_strength)
