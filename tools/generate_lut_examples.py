"""Generate example JPEGs for every bundled LUT.

The reference ships a curated example photo per LUT in
``LUTS/examples/`` so the catalog route can pair them
(``VRGDG_LUTVideoTools.py:188-219``).  This repo's LUTs are synthetic
palette looks, so the examples are a synthetic-but-representative test
frame (smooth sky gradient, skin/foliage/sea color patches, a neutral
gray ramp) graded through each LUT at full strength.

Run from the repo root:  python tools/generate_lut_examples.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WIDTH, HEIGHT = 480, 270


def test_frame() -> np.ndarray:
    """A frame exercising hues, skin tones, and the neutral axis."""
    yy = np.linspace(0, 1, HEIGHT, dtype=np.float32)[:, None]
    xx = np.linspace(0, 1, WIDTH, dtype=np.float32)[None, :]
    # sky-like vertical gradient
    frame = np.stack([
        0.35 + 0.25 * yy + 0.05 * xx,
        0.55 - 0.15 * yy + 0.05 * xx,
        0.85 - 0.45 * yy + 0.0 * xx,
    ], axis=-1) * np.ones((HEIGHT, WIDTH, 1), np.float32)
    # color patches: skin, foliage, sea, sand, brick
    patches = [
        (0.85, 0.64, 0.52), (0.23, 0.42, 0.18), (0.10, 0.32, 0.45),
        (0.84, 0.74, 0.55), (0.55, 0.23, 0.18), (0.9, 0.85, 0.2),
    ]
    pw = WIDTH // len(patches)
    for i, rgb in enumerate(patches):
        frame[HEIGHT // 2:HEIGHT * 3 // 4, i * pw:(i + 1) * pw] = rgb
    # neutral gray ramp on the bottom row band
    ramp = np.linspace(0, 1, WIDTH, dtype=np.float32)[None, :, None]
    frame[HEIGHT * 3 // 4:] = ramp
    return np.clip(frame, 0.0, 1.0)


def main() -> int:
    from PIL import Image

    import jax

    # asset generation is a host-side task; don't occupy (or wait on) a TPU
    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from vrgdg_tpu.core.cube import GLOBAL_LUT_CACHE, list_lut_files
    from vrgdg_tpu.ops.lut import apply_lut

    luts_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "LUTS")
    examples_dir = os.path.join(luts_dir, "examples")
    os.makedirs(examples_dir, exist_ok=True)

    frame = jnp.asarray(test_frame()[None])
    names = list_lut_files(luts_dir)
    for name in names:
        lut = GLOBAL_LUT_CACHE.load(os.path.join(luts_dir, name))
        graded = np.asarray(apply_lut(frame, lut, strength=10.0))[0]
        u8 = np.clip(graded * 255.0, 0, 255).astype(np.uint8)
        stem = os.path.splitext(name)[0]
        out = os.path.join(examples_dir, f"{stem}.jpg")
        Image.fromarray(u8, mode="RGB").save(out, quality=88)
        print(f"wrote {out}")
    print(f"{len(names)} examples")
    return 0


if __name__ == "__main__":
    sys.exit(main())
