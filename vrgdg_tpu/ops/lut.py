"""Trilinear 3D LUT application.

Reference math: ``VRGDG_IV_Adjustments.py:288-343`` — domain normalization
with a 1e-6 span floor, lattice coordinates ``norm * (N-1)``, floor/ceil
corner indices (ceil clamped to N-1), eight corner fetches from a table
indexed ``[b, g, r]``, and a three-stage lerp over the blue, green, then red
fractions.  Strength 0-10 maps to a 0-1 source/graded blend
(``VRGDG_IV_Adjustments.py:345-361``); alpha channels pass through.

TPU-first formulation: the ``(N, N, N, 3)`` table is flattened to
``(N^3, 3)`` and the eight corner fetches become ``jnp.take`` gathers with
precomputed flat indices.  XLA keeps the (431 KB for N=33) table resident
and fuses the lerp chain with neighbouring elementwise ops; the whole op is
vmappable/shardable over frames with zero collectives.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.cube import LutData


def _as_table(lut) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    if isinstance(lut, LutData):
        return (jnp.asarray(lut.table), jnp.asarray(lut.domain_min),
                jnp.asarray(lut.domain_max))
    table = jnp.asarray(lut)
    return table, jnp.zeros(3, table.dtype), jnp.ones(3, table.dtype)


def apply_lut(frames: jnp.ndarray, lut, domain_min=None, domain_max=None,
              strength: float | jnp.ndarray = 10.0) -> jnp.ndarray:
    """Apply a 3D LUT to a ``(..., C>=3)`` [0,1] array with trilinear
    interpolation and 0-10 strength blending."""
    table, dmin, dmax = _as_table(lut)
    if domain_min is not None:
        dmin = jnp.asarray(domain_min, frames.dtype)
    if domain_max is not None:
        dmax = jnp.asarray(domain_max, frames.dtype)

    source = frames[..., :3].astype(jnp.float32)
    size = table.shape[0]
    max_index = size - 1

    span = jnp.maximum(dmax - dmin, 1e-6)
    coords = jnp.clip((source - dmin) / span, 0.0, 1.0) * max_index

    lo = jnp.floor(coords)
    frac = coords - lo
    lo = lo.astype(jnp.int32)
    hi = jnp.minimum(lo + 1, max_index)

    r0, g0, b0 = lo[..., 0], lo[..., 1], lo[..., 2]
    r1, g1, b1 = hi[..., 0], hi[..., 1], hi[..., 2]
    fr, fg, fb = frac[..., 0:1], frac[..., 1:2], frac[..., 2:3]

    flat = table.reshape(-1, 3)

    def corner(b, g, r):
        return jnp.take(flat, (b * size + g) * size + r, axis=0)

    # Lerp over blue, then green, then red — the reference's stage order
    # (VRGDG_IV_Adjustments.py:327-335).
    c00 = corner(b0, g0, r0) * (1.0 - fb) + corner(b1, g0, r0) * fb
    c01 = corner(b0, g1, r0) * (1.0 - fb) + corner(b1, g1, r0) * fb
    c10 = corner(b0, g0, r1) * (1.0 - fb) + corner(b1, g0, r1) * fb
    c11 = corner(b0, g1, r1) * (1.0 - fb) + corner(b1, g1, r1) * fb

    c0 = c00 * (1.0 - fg) + c01 * fg
    c1 = c10 * (1.0 - fg) + c11 * fg
    graded = jnp.clip(c0 * (1.0 - fr) + c1 * fr, 0.0, 1.0).astype(frames.dtype)

    blend = jnp.clip(jnp.asarray(strength, jnp.float32), 0.0, 10.0) / 10.0
    mixed = source.astype(frames.dtype) * (1.0 - blend) + graded * blend

    if frames.shape[-1] > 3:
        return frames.at[..., :3].set(mixed)
    return mixed


def apply_lut_dense(frames: jnp.ndarray, dense_flat: jnp.ndarray,
                    strength: float | jnp.ndarray = 10.0) -> jnp.ndarray:
    """Apply a LUT via a precomputed dense 256^3 table
    (:func:`vrgdg_tpu.core.cube.dense_table`) — one gather per pixel.

    Bit-identical to :func:`apply_lut` when frame values are 8-bit
    quantized (i.e. came from decoded video/images); inputs are rounded to
    the nearest 8-bit level before lookup, so use only on such frames.
    """
    src = frames[..., :3].astype(jnp.float32)
    q = jnp.clip(jnp.round(src * 255.0), 0, 255).astype(jnp.int32)
    idx = ((q[..., 2] * 256 + q[..., 1]) * 256 + q[..., 0]).reshape(-1)
    graded = jnp.take(dense_flat, idx, axis=0).reshape(src.shape)
    blend = jnp.clip(jnp.asarray(strength, jnp.float32), 0.0, 10.0) / 10.0
    mixed = (src * (1.0 - blend) + graded * blend).astype(frames.dtype)
    if frames.shape[-1] > 3:
        return frames.at[..., :3].set(mixed)
    return mixed


def lut_identity_error(lut, size_probe: int = 64) -> float:
    """Max abs error of a LUT applied to a dense identity probe — a cheap
    property check that an identity lattice grades to identity."""
    axis = np.linspace(0.0, 1.0, size_probe, dtype=np.float32)
    rgb = np.stack(np.meshgrid(axis, axis, axis, indexing="ij"), axis=-1)
    rgb = rgb.reshape(1, size_probe, size_probe * size_probe, 3)
    out = apply_lut(jnp.asarray(rgb), lut)
    return float(jnp.max(jnp.abs(out - rgb)))
