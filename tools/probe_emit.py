"""On-chip A/B of the fused stack's final BHWC transpose (VERDICT r4
item 5): the production applier composite (uint8 in -> dequantize ->
fused pallas grade -> quantize -> uint8 BHWC out) vs a variant where the
kernel emits channel planes and the BHWC transpose happens AFTER the
uint8 quantize — 4x fewer bytes through the transpose.

Run alone on the chip (one TPU process at a time):
    python tools/probe_emit.py [batch] [height] [width]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from vrgdg_tpu.core.cube import build_palette_lut  # noqa: E402
from vrgdg_tpu.kernels.grade_pallas import fused_post_gather  # noqa: E402
from vrgdg_tpu.ops.color_match import lab_statistics  # noqa: E402
from vrgdg_tpu.ops.grade import _bundle_for  # noqa: E402

STEPS = 64


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    height = int(sys.argv[2]) if len(sys.argv) > 2 else 2160
    width = int(sys.argv[3]) if len(sys.argv) > 3 else 3840
    lut = build_palette_lut("#0b1d51, #1f6aa5, #f3d27a", 33)
    bundle = _bundle_for(lut)
    dmin = jnp.zeros(3, jnp.float32)
    dmax = jnp.ones(3, jnp.float32)
    rng = np.random.default_rng(7)
    ref_mean, ref_std = lab_statistics(jnp.asarray(
        rng.uniform(0, 1, (1, 256, 256, 3)).astype(np.float32)))
    kw = dict(blend=0.8, match_strength=0.7, sharpen_strength=1.5,
              grain_intensity=0.05, saturation_mix=0.5)
    frames_u8 = jnp.asarray(rng.integers(0, 256, (batch, height, width, 3),
                                         np.uint8))

    def run(tag, loop):
        compiled = jax.jit(loop)
        float(compiled(frames_u8))  # compile + warm
        t0 = time.perf_counter()
        float(compiled(frames_u8))
        per = (time.perf_counter() - t0) / STEPS * 1000.0
        print(f"{tag}: {per:.2f} ms/batch ({batch * 1000.0 / per:.2f} fps)",
              flush=True)
        return per

    def bhwc_loop(u8):
        def body(k, carry):
            x = carry.astype(jnp.float32) / 255.0
            out = fused_post_gather(x, bundle, dmin, dmax, ref_mean,
                                    ref_std, k.reshape(1), **kw)
            return jnp.clip(jnp.round(out * 255.0), 0, 255).astype(jnp.uint8)
        return lax.fori_loop(0, STEPS, body, u8)[0, 0, 0, 0]

    def planes_loop(u8):
        def body(k, carry):
            x = carry.astype(jnp.float32) / 255.0
            planes = fused_post_gather(x, bundle, dmin, dmax, ref_mean,
                                       ref_std, k.reshape(1),
                                       emit="planes", **kw)
            q = jnp.clip(jnp.round(planes * 255.0), 0, 255) \
                .astype(jnp.uint8)
            return jnp.transpose(q, (0, 2, 3, 1))
        return lax.fori_loop(0, STEPS, body, u8)[0, 0, 0, 0]

    a = run("bhwc (float transpose, production)", bhwc_loop)
    b = run("planes (uint8 transpose)", planes_loop)
    print(f"delta: {a - b:+.2f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
