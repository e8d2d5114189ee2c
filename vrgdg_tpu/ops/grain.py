"""Film grain synthesis.

Reference math (``nodes.py:51-60``, ``VRGDG_LUTVideoTools.py:262-277``):
per-pixel standard-normal noise, red channel scaled by 2.0 and blue by 3.0,
desaturated toward the (unscaled) green-channel noise by
``1 - saturation_mix``, then ``clamp(img + grain * intensity, 0, 1)``.

The determinism contract is the one the reference's enhancer locks down in
its unit test (``tests/test_standalone_video_enhancer.py:39-59``): grain for
absolute frame index ``i`` depends only on ``seed + i``
(``VRGDG_StandaloneVideoEnhancerNodes.py:261-275`` seeds one generator per
frame with ``(seed + frame_start + offset) & 0x7FFFFFFF``).  Here that is
achieved with counter-based JAX PRNG: the masked per-frame seed value is
folded into a fixed base key, so outputs are bit-identical regardless of
batch size, shard boundaries, or device placement — the property that makes
frame-axis mesh sharding exact.

Parity vs. the torch reference is distributional (mean/variance/channel
scaling), not bitwise: torch Philox and TPU PRNG streams differ by design.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SEED_MASK = 0x7FFFFFFF


def grain_field(frame_indices: jnp.ndarray, height: int, width: int,
                saturation_mix, seed) -> jnp.ndarray:
    """Deterministic grain field for a batch of absolute frame indices.

    Returns a ``(B, H, W, 3)`` float32 array: channel-scaled, desaturated,
    unit-intensity grain (not yet scaled by intensity or added to frames).
    """
    frame_indices = jnp.asarray(frame_indices, jnp.uint32)
    seed = jnp.asarray(seed, jnp.uint32)
    base = jax.random.key(0)

    def one_frame(index: jnp.ndarray) -> jnp.ndarray:
        per_frame = (seed + index) & _SEED_MASK
        key = jax.random.fold_in(base, per_frame)
        noise = jax.random.normal(key, (height, width, 3), jnp.float32)
        scaled = noise * jnp.asarray([2.0, 1.0, 3.0], jnp.float32)
        gray = noise[..., 1:2]
        return saturation_mix * scaled + (1.0 - saturation_mix) * gray

    return jax.vmap(one_frame)(frame_indices)


def film_grain(frames: jnp.ndarray, intensity, saturation_mix, seed,
               frame_start: jnp.ndarray | int = 0) -> jnp.ndarray:
    """Apply seeded film grain to a BHWC [0,1] batch.

    ``frame_start`` is the absolute index of ``frames[0]`` within the clip;
    passing consecutive chunks with matching ``frame_start`` values yields
    bit-identical output to processing the whole clip at once.
    """
    batch, height, width = frames.shape[0], frames.shape[1], frames.shape[2]
    indices = jnp.asarray(frame_start, jnp.uint32) + jnp.arange(batch, dtype=jnp.uint32)
    grain = grain_field(indices, height, width, saturation_mix, seed)
    if frames.shape[-1] > 3:
        out_rgb = jnp.clip(frames[..., :3] + grain * intensity, 0.0, 1.0)
        return frames.at[..., :3].set(out_rgb)
    return jnp.clip(frames + grain * intensity, 0.0, 1.0)
