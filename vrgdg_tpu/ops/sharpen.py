"""Sharpening stencils: unsharp mask, Laplacian, Sobel.

Reference math (``nodes.py:129-384``): each filter runs a 3x3 stencil over
BHWC frames and adds ``strength * detail`` back onto the image, clamped to
[0,1].  The reference ships two border conventions per filter — the GPU
paths zero-pad (``avg_pool2d(k=3, s=1, p=1)`` / ``conv2d(padding=1)``) while
the CPU paths edge-replicate via ``np.pad(mode="edge")``.  ``border``
selects which convention to match ("zero" = GPU parity, "edge" = CPU
parity, the node default).  The Sobel GPU path adds 1e-6 inside its sqrt
(``nodes.py:348``) while the CPU path does not (``nodes.py:379``); that
detail is tied to the border choice exactly as in the reference.

TPU-first formulation: stencils are expressed as nine shifted adds over a
padded array — pure elementwise work XLA fuses into one VPU pass over each
tile; no im2col, no conv dilation machinery for a fixed 3x3.
"""

from __future__ import annotations

import jax.numpy as jnp


def _pad_hw(frames: jnp.ndarray, border: str) -> jnp.ndarray:
    mode = "edge" if border == "edge" else "constant"
    return jnp.pad(frames, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=mode)


def _shift(padded: jnp.ndarray, dy: int, dx: int, h: int, w: int) -> jnp.ndarray:
    return padded[:, 1 + dy:1 + dy + h, 1 + dx:1 + dx + w, :]


def box_blur_3x3(frames: jnp.ndarray, border: str = "edge") -> jnp.ndarray:
    """9-tap mean with the chosen border convention (always divides by 9,
    matching torch ``avg_pool2d`` count_include_pad and the numpy path)."""
    h, w = frames.shape[1], frames.shape[2]
    p = _pad_hw(frames, border)
    acc = sum(_shift(p, dy, dx, h, w)
              for dy in (-1, 0, 1) for dx in (-1, 0, 1))
    return acc / 9.0


def unsharp(frames: jnp.ndarray, strength, border: str = "edge") -> jnp.ndarray:
    """``out = clamp(img + strength * (img - box3x3(img)))``
    (reference: ``nodes.py:156-209``; strength 0-10)."""
    blur = box_blur_3x3(frames, border)
    return jnp.clip(frames + strength * (frames - blur), 0.0, 1.0)


def laplacian_sharpen(frames: jnp.ndarray, strength,
                      border: str = "edge") -> jnp.ndarray:
    """4-neighbour Laplacian detail add (reference: ``nodes.py:234-289``;
    strength 0-2).

    Reference quirk reproduced faithfully: the two reference paths disagree
    in *sign*, not just padding.  The GPU conv kernel
    ``[[0,-1,0],[-1,4,-1],[0,-1,0]]`` (``nodes.py:249-257``) yields
    ``4x - neighbours`` (a sharpening detail), while the CPU path
    (``nodes.py:278-284``) computes ``neighbours - 4x`` — the negation.
    ``border="zero"`` matches the GPU path, ``border="edge"`` the CPU path.
    """
    h, w = frames.shape[1], frames.shape[2]
    p = _pad_hw(frames, border)
    neighbours = (_shift(p, 0, -1, h, w) + _shift(p, -1, 0, h, w)
                  + _shift(p, 1, 0, h, w) + _shift(p, 0, 1, h, w))
    lap = neighbours - 4.0 * frames
    if border == "zero":
        lap = -lap
    return jnp.clip(frames + strength * lap, 0.0, 1.0)


def sobel_sharpen(frames: jnp.ndarray, strength,
                  border: str = "edge") -> jnp.ndarray:
    """Sobel gradient-magnitude detail add (reference: ``nodes.py:314-384``;
    strength 0-2).  The zero-border (GPU-parity) variant includes the
    reference's 1e-6 epsilon inside the sqrt; the edge variant does not."""
    h, w = frames.shape[1], frames.shape[2]
    p = _pad_hw(frames, border)
    gx = (-_shift(p, -1, -1, h, w) - 2.0 * _shift(p, 0, -1, h, w)
          - _shift(p, 1, -1, h, w)
          + _shift(p, -1, 1, h, w) + 2.0 * _shift(p, 0, 1, h, w)
          + _shift(p, 1, 1, h, w))
    gy = (-_shift(p, -1, -1, h, w) - 2.0 * _shift(p, -1, 0, h, w)
          - _shift(p, -1, 1, h, w)
          + _shift(p, 1, -1, h, w) + 2.0 * _shift(p, 1, 0, h, w)
          + _shift(p, 1, 1, h, w))
    eps = 1e-6 if border == "zero" else 0.0
    edges = jnp.sqrt(gx * gx + gy * gy + eps)
    return jnp.clip(frames + strength * edges, 0.0, 1.0)
