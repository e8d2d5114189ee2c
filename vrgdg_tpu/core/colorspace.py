"""Color-space primitives in pure ``jax.numpy``.

The reference delegates RGB<->LAB to kornia's CUDA path for its Color Match
node (``nodes.py:98-115``); here the same D65 CIELAB pipeline is written
directly in jnp so it fuses into the surrounding grade stack under XLA.
Rec.709 luma matches the constants used throughout the reference's adjust
stack and palette-LUT generator (``VRGDG_LUTVideoTools.py:332``,
``VRGDG_IV_Adjustments.py:96``).

All functions take float32 arrays with RGB in the trailing axis, values in
[0, 1] (LAB in its natural L:[0,100], a/b:[-128,127] ranges), and are shape
polymorphic over leading axes, so they work on single pixels, frames, or
BHWC batches alike.
"""

from __future__ import annotations

import jax.numpy as jnp

# Rec.709 / sRGB luma coefficients.
LUMA_R = 0.2126
LUMA_G = 0.7152
LUMA_B = 0.0722

# sRGB D65 reference white.
_XYZ_WHITE = (0.95047, 1.0, 1.08883)

# Linear sRGB -> CIE XYZ (same matrix kornia uses for rgb_to_xyz).
_RGB2XYZ = (
    (0.412453, 0.357580, 0.180423),
    (0.212671, 0.715160, 0.072169),
    (0.019334, 0.119193, 0.950227),
)

# CIE XYZ -> linear sRGB (inverse of the above).
_XYZ2RGB = (
    (3.2404813432005266, -1.5371515162713185, -0.4985363261688878),
    (-0.9692549499965682, 1.8759900014898907, 0.0415559265582928),
    (0.0556466391351772, -0.2040413383665112, 1.0573110696453443),
)

# CIELAB nonlinearity constants.
_LAB_EPS = 0.008856        # (6/29)^3
_LAB_KAPPA = 7.787         # (1/3) * (29/6)^2, kornia's truncated constant
_LAB_OFFSET = 4.0 / 29.0
_LAB_FT_CUT = 0.2068966    # 6/29, cube-root domain threshold


def rec709_luma(rgb: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    """Rec.709 luma of an ``(..., 3)`` RGB array."""
    luma = (rgb[..., 0] * LUMA_R + rgb[..., 1] * LUMA_G + rgb[..., 2] * LUMA_B)
    return luma[..., None] if keepdims else luma


def srgb_to_linear(srgb: jnp.ndarray) -> jnp.ndarray:
    """sRGB electro-optical transfer: gamma-encoded -> linear light."""
    return jnp.where(srgb > 0.04045,
                     ((srgb + 0.055) / 1.055) ** 2.4,
                     srgb / 12.92)


def linear_to_srgb(linear: jnp.ndarray) -> jnp.ndarray:
    """Linear light -> gamma-encoded sRGB."""
    # Guard the fractional power against tiny negatives from upstream math.
    safe = jnp.maximum(linear, 0.0)
    return jnp.where(linear > 0.0031308,
                     1.055 * safe ** (1.0 / 2.4) - 0.055,
                     12.92 * linear)


def _matmul3(rgb: jnp.ndarray, m) -> jnp.ndarray:
    # Written as an explicit linear combination rather than a (..., 3) @ 3x3
    # matmul: a 3-wide contraction can't fill the MXU, fuses better as VPU
    # work, and sidesteps JAX's default bf16-pass matmul precision (which
    # costs ~3e-3 absolute error here — measured, not hypothetical).
    c0, c1, c2 = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    rows = [c0 * row[0] + c1 * row[1] + c2 * row[2] for row in m]
    return jnp.stack(rows, axis=-1)


def rgb_to_xyz(linear_rgb: jnp.ndarray) -> jnp.ndarray:
    return _matmul3(linear_rgb, _RGB2XYZ)


def xyz_to_rgb(xyz: jnp.ndarray) -> jnp.ndarray:
    return _matmul3(xyz, _XYZ2RGB)


def rgb_to_lab(rgb: jnp.ndarray) -> jnp.ndarray:
    """Gamma-encoded sRGB in [0,1] -> CIELAB (L in [0,100], a/b signed).

    Pipeline identical to the kornia path the reference's ColorMatch node
    uses (``nodes.py:98``): sRGB linearize -> XYZ -> D65 normalize ->
    cube-root spline -> Lab.
    """
    xyz = rgb_to_xyz(srgb_to_linear(rgb))
    white = jnp.asarray(_XYZ_WHITE, dtype=rgb.dtype)
    t = xyz / white
    ft = jnp.where(t > _LAB_EPS,
                   jnp.cbrt(jnp.maximum(t, 0.0)),
                   _LAB_KAPPA * t + _LAB_OFFSET)
    fx, fy, fz = ft[..., 0], ft[..., 1], ft[..., 2]
    lab_l = 116.0 * fy - 16.0
    lab_a = 500.0 * (fx - fy)
    lab_b = 200.0 * (fy - fz)
    return jnp.stack([lab_l, lab_a, lab_b], axis=-1)


def lab_to_rgb(lab: jnp.ndarray, clip: bool = True) -> jnp.ndarray:
    """CIELAB -> gamma-encoded sRGB, mirroring kornia's ``lab_to_rgb``
    including its out-of-gamut handling (fz floor at 0, linear RGB floor at
    0, optional final clip) used at ``nodes.py:115``."""
    fy = (lab[..., 0] + 16.0) / 116.0
    fx = lab[..., 1] / 500.0 + fy
    fz = jnp.maximum(fy - lab[..., 2] / 200.0, 0.0)
    ft = jnp.stack([fx, fy, fz], axis=-1)
    t = jnp.where(ft > _LAB_FT_CUT, ft ** 3, (ft - _LAB_OFFSET) / _LAB_KAPPA)
    xyz = t * jnp.asarray(_XYZ_WHITE, dtype=lab.dtype)
    linear = jnp.maximum(xyz_to_rgb(xyz), 0.0)
    rgb = linear_to_srgb(linear)
    if clip:
        rgb = jnp.clip(rgb, 0.0, 1.0)
    return rgb
