"""Benchmark: 4K frames/sec/chip on the fused grade stack.

Measures the BASELINE.json flagship config — fused grain + 3D LUT +
color match + unsharp sharpen on 4K (3840x2160) frames — on the default
JAX device, and compares against the reference-path oracle (the same math
as the torch/numpy reference implementation, measured on this host's CPU),
since the reference publishes no numbers of its own (BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

WIDTH, HEIGHT = 3840, 2160
BATCH_CANDIDATES = (4, 2, 1)
TIMED_FRAMES = 32


def _inputs(batch):
    rng = np.random.default_rng(0)
    frames = rng.uniform(0, 1, (batch, HEIGHT, WIDTH, 3)).astype(np.float32)
    reference = rng.uniform(0, 1, (1, 256, 256, 3)).astype(np.float32)
    return frames, reference


def _is_oom(exc: Exception) -> bool:
    text = str(exc).lower()
    return "out of memory" in text or "resource_exhausted" in text \
        or "hbm" in text


def bench_tpu(reference_np):
    """Chained-scan timing: N dependent grade steps inside ONE jitted
    program, so async dispatch through remote backends cannot inflate the
    number (each step consumes the previous step's output), followed by a
    scalar host fetch as the hard sync."""
    import jax
    import jax.numpy as jnp

    from vrgdg_tpu.core.cube import build_palette_lut, dense_table
    from vrgdg_tpu.core.params import (ColorMatchParams, GrainParams,
                                       LUTParams, SharpenParams)
    from vrgdg_tpu.ops.color_match import lab_statistics
    from vrgdg_tpu.ops.grade import GradeConfig, _grade_impl

    config = GradeConfig(
        lut=LUTParams.normalize(8.0),
        lut_mode="dense",  # video frames are 8-bit sourced: bit-exact
        color_match=ColorMatchParams.normalize(0.7),
        sharpen=SharpenParams.normalize(1.5, border="zero"),
        grain=GrainParams.normalize(0.05, 0.5, seed=42),
    )
    lut = build_palette_lut("#0b1d51, #1f6aa5, #f3d27a", 33)
    dense = jnp.asarray(dense_table(lut))
    dmin = jnp.zeros(3, jnp.float32)
    dmax = jnp.ones(3, jnp.float32)
    ref_mean, ref_std = lab_statistics(jnp.asarray(reference_np))

    last_error = None
    for batch in BATCH_CANDIDATES:
        frames_np, _ = _inputs(batch)
        frames = jnp.asarray(frames_np)
        iters = max(2, TIMED_FRAMES // batch)

        @jax.jit
        def chained(frames):
            def body(carry, i):
                out = _grade_impl(carry, config, dense, dmin, dmax,
                                  ref_mean, ref_std,
                                  (i * batch).astype(jnp.uint32))
                return out, ()
            out, _ = jax.lax.scan(body, frames,
                                  jnp.arange(iters, dtype=jnp.int32))
            return jnp.sum(out[0, 0, :2])

        try:
            float(chained(frames))  # warmup/compile + hard sync
        except Exception as exc:
            if _is_oom(exc):
                last_error = exc
                continue
            raise
        start = time.perf_counter()
        float(chained(frames))
        elapsed = time.perf_counter() - start
        return (iters * batch) / elapsed, jax.default_backend(), batch
    raise RuntimeError(f"All batch sizes OOMed: {last_error}")


def bench_oracle(frames_np, reference_np):
    """Reference-path oracle: the reference nodes' math in float32 torch on
    this host's CPU (BASELINE.md: the baseline is self-measured — the
    reference publishes no numbers)."""
    import torch
    import torch.nn.functional as F

    from vrgdg_tpu.core.cube import build_palette_lut

    def rgb_to_lab(rgb):  # kornia-equivalent pipeline, f32
        lin = torch.where(rgb > 0.04045, ((rgb + 0.055) / 1.055) ** 2.4,
                          rgb / 12.92)
        m = torch.tensor([[0.412453, 0.357580, 0.180423],
                          [0.212671, 0.715160, 0.072169],
                          [0.019334, 0.119193, 0.950227]])
        xyz = lin @ m.T
        t = xyz / torch.tensor([0.95047, 1.0, 1.08883])
        ft = torch.where(t > 0.008856, t.clamp(min=0) ** (1 / 3),
                         7.787 * t + 4 / 29)
        return torch.stack([116 * ft[..., 1] - 16,
                            500 * (ft[..., 0] - ft[..., 1]),
                            200 * (ft[..., 1] - ft[..., 2])], -1)

    def lab_to_rgb(lab):
        fy = (lab[..., 0] + 16) / 116
        fx = lab[..., 1] / 500 + fy
        fz = (fy - lab[..., 2] / 200).clamp(min=0)
        ft = torch.stack([fx, fy, fz], -1)
        t = torch.where(ft > 0.2068966, ft ** 3, (ft - 4 / 29) / 7.787)
        xyz = t * torch.tensor([0.95047, 1.0, 1.08883])
        m = torch.tensor(
            [[3.2404813432005266, -1.5371515162713185, -0.4985363261688878],
             [-0.9692549499965682, 1.8759900014898907, 0.0415559265582928],
             [0.0556466391351772, -0.2040413383665112, 1.0573110696453443]])
        lin = (xyz @ m.T).clamp(min=0)
        return torch.where(lin > 0.0031308,
                           1.055 * lin ** (1 / 2.4) - 0.055,
                           12.92 * lin).clamp(0, 1)

    lut = torch.from_numpy(build_palette_lut(
        "#0b1d51, #1f6aa5, #f3d27a", 33).table)
    img = torch.from_numpy(frames_np[:1])
    ref = torch.from_numpy(reference_np)
    start = time.perf_counter()
    with torch.inference_mode():
        # trilinear LUT (VRGDG_IV_Adjustments.py:288-343) at strength 8/10
        coords = img.clamp(0, 1) * (lut.shape[0] - 1)
        lo = coords.floor().long()
        hi = (lo + 1).clamp(max=lut.shape[0] - 1)
        f = (coords - lo.float())
        r0, g0, b0 = lo[..., 0], lo[..., 1], lo[..., 2]
        r1, g1, b1 = hi[..., 0], hi[..., 1], hi[..., 2]
        fr, fg, fb = (f[..., 0:1], f[..., 1:2], f[..., 2:3])
        c00 = lut[b0, g0, r0] * (1 - fb) + lut[b1, g0, r0] * fb
        c01 = lut[b0, g1, r0] * (1 - fb) + lut[b1, g1, r0] * fb
        c10 = lut[b0, g0, r1] * (1 - fb) + lut[b1, g0, r1] * fb
        c11 = lut[b0, g1, r1] * (1 - fb) + lut[b1, g1, r1] * fb
        graded = ((c00 * (1 - fg) + c01 * fg) * (1 - fr)
                  + (c10 * (1 - fg) + c11 * fg) * fr).clamp(0, 1)
        out = img * 0.2 + graded * 0.8
        # color match (nodes.py:91-124)
        il, rl = rgb_to_lab(out), rgb_to_lab(ref)
        matched = ((il - il.mean(dim=(1, 2), keepdim=True))
                   / (il.std(dim=(1, 2), keepdim=True) + 1e-5)
                   * (rl.std(dim=(1, 2), keepdim=True) + 1e-5)
                   + rl.mean(dim=(1, 2), keepdim=True))
        out = lab_to_rgb(0.7 * matched + 0.3 * il)
        # unsharp (nodes.py:166-177) + grain (nodes.py:51-60)
        x = out.permute(0, 3, 1, 2)
        blur = F.avg_pool2d(x, kernel_size=3, stride=1, padding=1)
        x = (x + 1.5 * (x - blur)).clamp(0, 1)
        grain = torch.randn_like(x)
        grain[:, 0] *= 2.0
        grain[:, 2] *= 3.0
        gray = grain[:, 1:2].repeat(1, 3, 1, 1)
        grain = 0.5 * grain + 0.5 * gray
        out = (x + grain * 0.05).clamp(0, 1)
        _ = out.permute(0, 2, 3, 1).numpy()
    elapsed = time.perf_counter() - start
    return 1.0 / elapsed


def main():
    reference = _inputs(1)[1]
    tpu_fps, backend, batch = bench_tpu(reference)
    frames, _ = _inputs(1)
    oracle_fps = bench_oracle(frames, reference)
    print(json.dumps({
        "metric": "4K frames/sec/chip, fused grain+LUT+colormatch+sharpen",
        "value": round(tpu_fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(tpu_fps / oracle_fps, 3),
        "baseline_fps": round(oracle_fps, 3),
        "backend": backend,
        "batch": batch,
        "resolution": f"{WIDTH}x{HEIGHT}",
    }))


if __name__ == "__main__":
    main()
