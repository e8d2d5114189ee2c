"""Pallas TPU film-grain kernel: on-chip PRNG + Box-Muller + blend.

The jnp path (:mod:`vrgdg_tpu.ops.grain`) draws normals with JAX's
counter-based threefry — ~10 ALU ops per random word before the normal
transform.  This kernel uses the TPU's hardware PRNG
(``pltpu.prng_seed`` / ``pltpu.prng_random_bits``) and a Box-Muller
transform in VMEM, fusing noise synthesis, channel scaling, desaturation
and the final blend into one pass over each frame tile — the SURVEY.md §7
step-3 "on-chip PRNG" design.

Layout: BHWC frames are viewed as ``(B, H, W*3)`` — a free reshape of the
contiguous layout — so the lane dimension is a multiple of 128 instead of a
3-wide trailing dim that would pad 42x in VMEM.  Channels live interleaved
along lanes (``lane % 3``); the desaturation "broadcast the green-channel
noise" becomes two lane rolls + selects.

Determinism contract (same shape as the reference's, see
``vrgdg_tpu/ops/grain.py``): the noise for a pixel depends only on
``(seed + absolute_frame_index, row_tile, position)``, so output is
invariant to batch/shard boundaries.  The *stream* differs from the jnp
path (different PRNG), which is within the documented distributional-parity
budget for grain (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 16  # rows per program; part of the determinism contract

_TWO_PI = 6.283185307179586


def _uniform_from_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """uint32 -> float32 uniform in (0, 1].

    Mosaic has no uint32->float32 convert, so build the float bitwise: OR
    the top 23 random bits into the mantissa of exponent 127 (0x3F800000),
    bitcast to get a float in [1, 2), and map via ``2 - f`` to (0, 1] —
    strictly positive, as the Box-Muller log() requires.
    """
    mantissa = jax.lax.shift_right_logical(bits, jnp.uint32(9))
    f = pltpu.bitcast(mantissa | jnp.uint32(0x3F800000), jnp.float32)
    return 2.0 - f


def _grain_kernel(seed_ref, x_ref, out_ref, *, intensity: float,
                  saturation_mix: float):
    frame = pl.program_id(0)
    tile = pl.program_id(1)
    # Distinct, reproducible stream per (absolute frame, row tile).
    pltpu.prng_seed(seed_ref[0] + frame, tile)

    shape = x_ref.shape  # (1, TILE_H, W*3), channels interleaved on lanes
    u1 = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits(shape),
                                          jnp.uint32))
    u2 = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits(shape),
                                          jnp.uint32))
    # Box-Muller: standard normal from two uniforms.
    noise = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)

    lane = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    channel = lane % 3
    # R noise x2, B noise x3 (reference nodes.py:53-54).
    scale = jnp.where(channel == 0, 2.0, jnp.where(channel == 2, 3.0, 1.0))
    scaled = noise * scale
    # gray = the (unscaled) green-channel noise broadcast to all three
    # channels: lane 3k -> 3k+1 (roll left), lane 3k+2 -> 3k+1 (roll right).
    lanes = shape[-1]
    # pltpu.roll requires non-negative shifts; a circular left-shift by 1
    # is a right-shift by lanes-1.  Wraparound lanes land on padding.
    gray = jnp.where(channel == 0,
                     pltpu.roll(noise, lanes - 1, axis=len(shape) - 1),
                     jnp.where(channel == 2,
                               pltpu.roll(noise, 1, axis=len(shape) - 1),
                               noise))
    grain = saturation_mix * scaled + (1.0 - saturation_mix) * gray
    out_ref[:] = jnp.clip(x_ref[:] + grain * intensity, 0.0, 1.0)


@functools.partial(jax.jit,
                   static_argnames=("intensity", "saturation_mix",
                                    "interpret"))
def _grain_pallas_padded(frames_flat, seed_plus_start, *, intensity: float,
                         saturation_mix: float, interpret: bool = False):
    batch, height, width3 = frames_flat.shape
    grid = (batch, height // TILE_H)
    return pl.pallas_call(
        functools.partial(_grain_kernel, intensity=intensity,
                          saturation_mix=saturation_mix),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TILE_H, width3),
                         lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_H, width3),
                               lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(frames_flat.shape, jnp.float32),
        # NOTE: the TPU interpreter stubs prng_random_bits to zeros, so
        # interpreted runs exercise plumbing/blending only, not the noise.
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed_plus_start, frames_flat)


def film_grain_pallas(frames: jnp.ndarray, intensity, saturation_mix, seed,
                      frame_start: int = 0,
                      interpret: bool | None = None) -> jnp.ndarray:
    """Drop-in for :func:`vrgdg_tpu.ops.grain.film_grain` with hardware
    PRNG (different noise stream, same determinism contract).

    Frames are padded to the row-tile/lane grid internally and cropped
    back, so noise for a given pixel never depends on the frame's storage
    shape.  ``interpret=True`` runs the kernel in interpreter mode (used by
    the CPU test suite); the default picks interpret off-TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    batch, height, width = frames.shape[0], frames.shape[1], frames.shape[2]
    rgb = frames[..., :3].astype(jnp.float32)

    pad_h = (-height) % TILE_H
    # W*3 lanes must divide 128 -> pad W to a multiple of 128 (3*128 lanes
    # also keeps the channel interleave aligned across rows).
    pad_w = (-width) % 128
    if pad_h or pad_w:
        rgb = jnp.pad(rgb, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    padded_h, padded_w = rgb.shape[1], rgb.shape[2]
    flat = rgb.reshape(batch, padded_h, padded_w * 3)

    seed_arr = (jnp.asarray(seed, jnp.int32)
                + jnp.asarray(frame_start, jnp.int32)).reshape(1)
    out = _grain_pallas_padded(flat, seed_arr,
                               intensity=float(intensity),
                               saturation_mix=float(saturation_mix),
                               interpret=bool(interpret))
    out = out.reshape(batch, padded_h, padded_w, 3)[:, :height, :width, :]
    if frames.shape[-1] > 3:
        return frames.at[..., :3].set(out.astype(frames.dtype))
    return out.astype(frames.dtype)
