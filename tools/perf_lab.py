"""LUT-stage perf lab: measure corner-bundle gather/relayout variants.

Round-4 follow-up to BASELINE.md's round-3 exploration log. The fused 4K
grade spends its budget on: gather custom-call ~29.8 ms/batch (row-issue
floor), gather-output relayout copy (B,P,24)->(24,B,P) ~14.6 ms, fusions
~15.8 ms. This lab times ONE lever per process invocation (the remote
compile helper is flaky for ~GB-operand programs; a fresh process per
variant isolates failures and keeps the TPU hold short):

    python tools/perf_lab.py baseline24      # current production path
    python tools/perf_lab.py padded32        # 24->32 f32 pad: lane-divisible relayout
    python tools/perf_lab.py transposed24    # gather columns of (24, N^3): output lands (24,B,P)
    python tools/perf_lab.py transposed32    # same with a 32-row padded table
    python tools/perf_lab.py baseline24_b4   # batch 4 (fusion-utilization probe)
    python tools/perf_lab.py padded32_b4

Each prints ms/frame for the LUT stage alone (trilerp + strength blend
included) at 4K, chained-scan timed (64 dependent steps, scalar readback),
plus a parity check against the eight-gather oracle on a small batch.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 64


def build_variant(name):
    import jax.numpy as jnp
    from jax import lax

    from vrgdg_tpu.core.cube import build_palette_lut, corner_bundle

    lut = build_palette_lut("#0b1d51, #1f6aa5, #f3d27a", 33)
    bundle_np = corner_bundle(lut.table)            # (N^3, 24)
    size = lut.table.shape[0]
    max_index = size - 1

    width = 24
    transposed = name.startswith("transposed")
    if name.startswith("padded32") or name == "transposed32":
        width = 32
        bundle_np = np.pad(bundle_np, ((0, 0), (0, 8)))
    if transposed:
        table = jnp.asarray(np.ascontiguousarray(bundle_np.T))  # (w, N^3)
        dnums = lax.GatherDimensionNumbers(
            offset_dims=(0,), collapsed_slice_dims=(1,),
            start_index_map=(1,))
        slice_sizes = (width, 1)
    else:
        table = jnp.asarray(bundle_np)                           # (N^3, w)
        dnums = lax.GatherDimensionNumbers(
            offset_dims=(0,), collapsed_slice_dims=(0,),
            start_index_map=(0,))
        slice_sizes = (1, width)

    strength_blend = 0.8

    def lut_stage(frames):
        src = frames[..., :3]
        batch, h, w, _ = src.shape
        pixels = h * w
        pm = jnp.transpose(src.reshape(batch, pixels, 3), (2, 0, 1))
        coords = jnp.clip(pm, 0.0, 1.0) * max_index
        lo = jnp.floor(coords)
        frac = coords - lo
        lo = lo.astype(jnp.int32)
        cell = (lo[2] * size + lo[1]) * size + lo[0]
        if name.startswith("split"):
            # one gather custom-call per frame: the measured row-issue
            # rate is higher at ~8M rows than at 16.6M
            per_frame = [
                lax.gather(table, cell[b][..., None], dnums,
                           slice_sizes=slice_sizes,
                           mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
                for b in range(batch)]
            g = jnp.stack(per_frame, axis=1)        # (w, B, P)
        else:
            g = lax.gather(table, cell[..., None], dnums,
                           slice_sizes=slice_sizes,
                           mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        fr, fg, fb = frac[0], frac[1], frac[2]
        out_ch = []
        for c in range(3):
            c00 = g[0 + c] * (1.0 - fb) + g[3 + c] * fb
            c01 = g[6 + c] * (1.0 - fb) + g[9 + c] * fb
            c10 = g[12 + c] * (1.0 - fb) + g[15 + c] * fb
            c11 = g[18 + c] * (1.0 - fb) + g[21 + c] * fb
            c0 = c00 * (1.0 - fg) + c01 * fg
            c1 = c10 * (1.0 - fg) + c11 * fg
            out_ch.append(jnp.clip(c0 * (1.0 - fr) + c1 * fr, 0.0, 1.0))
        planes = [pm[c] * (1.0 - strength_blend)
                  + out_ch[c] * strength_blend for c in range(3)]
        return jnp.stack(planes, axis=-1).reshape(batch, h, w, 3)

    return lut_stage, lut


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "baseline24"
    if name == "fused":
        return fused_stack_ab()
    if name == "fused_1080p":
        return fused_stack_ab((8, 1080, 1920, 3))
    if name == "rowmajor":
        return phase1_layout_ab()
    if name == "rowmajor_1080p":
        return phase1_layout_ab((8, 1080, 1920, 3))
    if name == "flat":
        return phase1_layout_ab(layouts=("rowmajor", "flat"))
    if name == "flat_1080p":
        return phase1_layout_ab((8, 1080, 1920, 3),
                                layouts=("rowmajor", "flat"))
    batch = 2
    if name.endswith("_b4"):
        batch = 4
    elif name.endswith("_b1"):
        batch = 1

    import jax
    import jax.numpy as jnp
    from jax import lax

    lut_stage, lut = build_variant(name)

    # parity vs the eight-gather oracle on a small batch
    from vrgdg_tpu.ops.lut import apply_lut
    rng = np.random.default_rng(0)
    small = jnp.asarray(rng.uniform(0, 1, (1, 64, 96, 3)).astype(np.float32))
    want = apply_lut(small, lut, strength=8.0)
    got = lut_stage(small)
    err = float(jnp.max(jnp.abs(want - got)))
    print(f"[{name}] parity max abs err vs oracle: {err:.2e}", flush=True)
    assert err < 1e-6, "variant diverged from the oracle"

    frames = jnp.asarray(rng.uniform(0, 1, (batch, 2160, 3840, 3))
                         .astype(np.float32))

    @jax.jit
    def chained(x):
        def body(carry, _):
            return lut_stage(carry), ()
        out, _ = lax.scan(body, x, None, length=STEPS)
        return out[0, 0, 0, 0]

    t0 = time.perf_counter()
    float(chained(frames))
    print(f"[{name}] compile+first: {time.perf_counter() - t0:.1f} s",
          flush=True)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(chained(frames))
        best = min(best, (time.perf_counter() - t0) / STEPS)
    print(f"[{name}] batch={batch}: {best * 1e3:.2f} ms/batch, "
          f"{best / batch * 1e3:.2f} ms/frame, {batch / best:.1f} fps",
          flush=True)



def fused_stack_ab(shape=(2, 2160, 3840, 3), steps=STEPS):
    """A/B the FULL fused stack (grain+LUT+colormatch+sharpen) between
    fused_mode='xla' and 'pallas' at a given shape:

        python tools/perf_lab.py fused            # 4K batch 2
        python tools/perf_lab.py fused_1080p      # 1080p batch 8
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    from vrgdg_tpu.core.cube import build_palette_lut
    from vrgdg_tpu.core.params import (ColorMatchParams, GrainParams,
                                       LUTParams, SharpenParams)
    from vrgdg_tpu.ops.color_match import lab_statistics
    from vrgdg_tpu.ops.grade import GradeConfig, _bundle_for, _grade_impl

    lut = build_palette_lut("#0b1d51, #1f6aa5, #f3d27a", 33)
    bundle = _bundle_for(lut)
    dmin = jnp.zeros(3, jnp.float32)
    dmax = jnp.ones(3, jnp.float32)
    rng = np.random.default_rng(7)
    ref_mean, ref_std = lab_statistics(jnp.asarray(
        rng.uniform(0, 1, (1, 256, 256, 3)).astype(np.float32)))
    frames = jnp.asarray(np.random.default_rng(0)
                         .uniform(0, 1, shape).astype(np.float32))
    batch = shape[0]
    for mode in ("xla", "pallas"):
        cfg = GradeConfig(lut=LUTParams.normalize(8.0),
                          color_match=ColorMatchParams.normalize(0.7),
                          sharpen=SharpenParams.normalize(1.5,
                                                          border="zero"),
                          grain=GrainParams.normalize(0.05, 0.5, seed=42),
                          fused_mode=mode)

        @jax.jit
        def chained(x, _cfg=cfg):
            def body(carry, i):
                return _grade_impl(carry, _cfg, bundle, dmin, dmax,
                                   ref_mean, ref_std,
                                   (i * 4).astype(jnp.uint32)), ()
            out, _ = lax.scan(body, x,
                              jnp.arange(steps, dtype=jnp.int32))
            return out[0, 0, 0, 0]

        t0 = time.perf_counter()
        float(chained(frames))
        print(f"[fused {mode} {shape[1]}p] compile "
              f"{time.perf_counter() - t0:.0f}s", flush=True)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(chained(frames))
            best = min(best, (time.perf_counter() - t0) / steps)
        print(f"[fused {mode} {shape[1]}p] {best * 1e3:.2f} ms/batch  "
              f"{batch / best:.2f} fps", flush=True)

def phase1_layout_ab(shape=(2, 2160, 3840, 3), steps=STEPS,
                     layouts=("plane", "rowmajor")):
    """A/B the two-phase kernel's inter-phase LAYOUTS (``layouts``
    picks any subset): 'plane' = corner-major planes via the XLA
    relayout copy; 'rowmajor' = consume the gather's native (rows, 24)
    layout with in-VMEM square transposes (round-4 lever); 'flat' =
    additionally feed phase 2 straight off phase 1's flat rows
    (production default):

        python tools/perf_lab.py rowmajor         # plane vs rowmajor, 4K b2
        python tools/perf_lab.py rowmajor_1080p   # same at 1080p b8
        python tools/perf_lab.py flat             # rowmajor vs flat, 4K b2
        python tools/perf_lab.py flat_1080p       # same at 1080p b8
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    from vrgdg_tpu.core.cube import build_palette_lut
    from vrgdg_tpu.kernels.grade_pallas import fused_post_gather
    from vrgdg_tpu.ops.color_match import lab_statistics
    from vrgdg_tpu.ops.grade import _bundle_for

    lut = build_palette_lut("#0b1d51, #1f6aa5, #f3d27a", 33)
    bundle = _bundle_for(lut)
    dmin = jnp.zeros(3, jnp.float32)
    dmax = jnp.ones(3, jnp.float32)
    rng = np.random.default_rng(7)
    ref_mean, ref_std = lab_statistics(jnp.asarray(
        rng.uniform(0, 1, (1, 256, 256, 3)).astype(np.float32)))
    frames = jnp.asarray(np.random.default_rng(0)
                         .uniform(0, 1, shape).astype(np.float32))
    batch = shape[0]
    kw = dict(blend=0.8, match_strength=0.7, sharpen_strength=1.5,
              grain_intensity=0.05, saturation_mix=0.5)

    results = {}
    for layout in layouts:

        @jax.jit
        def chained(x, _layout=layout):
            def body(carry, i):
                return fused_post_gather(
                    carry, bundle, dmin, dmax, ref_mean, ref_std,
                    (i * 4).reshape(1), layout=_layout, **kw), ()
            out, _ = lax.scan(body, x,
                              jnp.arange(steps, dtype=jnp.int32))
            return out[0, 0, 0, 0]

        t0 = time.perf_counter()
        float(chained(frames))
        print(f"[{layout} {shape[1]}p] compile "
              f"{time.perf_counter() - t0:.0f}s", flush=True)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(chained(frames))
            best = min(best, (time.perf_counter() - t0) / steps)
        results[layout] = best
        print(f"[{layout} {shape[1]}p] {best * 1e3:.2f} ms/batch  "
              f"{batch / best:.2f} fps", flush=True)
    a, b = layouts
    speedup = results[a] / results[b]
    print(f"[{b} {shape[1]}p] speedup vs {a}: {speedup:.3f}x",
          flush=True)


if __name__ == "__main__":
    main()
