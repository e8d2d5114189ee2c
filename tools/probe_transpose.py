"""Mosaic lowering probe for the row-major phase-1 design (round 4).

Checks, on the real TPU, that a Pallas kernel can:
  1. take a (rows, 24) f32 block (gather-native layout, lanes padded),
  2. slice it into (128, 24) sublane chunks,
  3. transpose each to (24, 128) (Mosaic lowers the narrow transpose
     directly; a zero-pad to a square (128, 128) tile also lowers and
     measured identical),
  4. stack the transposed chunks and permute leading dims,
  5. read per-corner (sub, 128) planes out of the result.

If this compiles and matches numpy, the fused-grade phase 1 can consume
the gather output directly and the XLA relayout copy disappears — this
probe validated kernels/grade_pallas._phase1_rowmajor_kernel.
"""

from __future__ import annotations

import functools
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    SUB = 8          # pixel sublane-tiles per block (block = SUB*128 rows)
    W = 24

    def kernel(g_ref, out_ref):
        # g_ref: (SUB*128, 24). Build (24, SUB, 128): corner-major planes.
        chunks = []
        for s in range(SUB):
            block = g_ref[pl.ds(s * 128, 128), :]          # (128, 24)
            chunks.append(jnp.transpose(block))             # (24, 128)
        stacked = jnp.stack(chunks, axis=0)                 # (SUB, 24, 128)
        planes = jnp.transpose(stacked, (1, 0, 2))          # (24, SUB, 128)
        acc = jnp.zeros((SUB, 128), jnp.float32)
        for k in range(W):
            acc = acc + planes[k] * float(k + 1)
        out_ref[0] = acc

    rows = SUB * 128 * 4                                    # 4 blocks
    rng = np.random.default_rng(0)
    g = rng.uniform(-1, 1, (rows, W)).astype(np.float32)

    out = pl.pallas_call(
        kernel,
        grid=(rows // (SUB * 128),),
        in_specs=[pl.BlockSpec((SUB * 128, W), lambda t: (t, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, SUB, 128), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows // (SUB * 128), SUB, 128),
                                       jnp.float32),
    )(jnp.asarray(g))

    want = (g * (np.arange(W, dtype=np.float32) + 1.0)).sum(axis=1)
    want = want.reshape(rows // (SUB * 128), SUB, 128)
    err = float(np.max(np.abs(np.asarray(out) - want)))
    print(f"backend={jax.devices()[0].platform} max abs err: {err:.2e}")
    assert err < 1e-4, "row-major transpose probe diverged"
    print("probe OK")


if __name__ == "__main__":
    sys.exit(main())
