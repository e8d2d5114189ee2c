"""Two-phase Pallas consumer for the fused grade stack (post-gather).

The XLA fused grade (ops/grade.py) runs the post-gather stages —
trilerp, color match (LAB stats + transfer), sharpen, grain — as ~4
XLA loop fusions at ~62% HBM utilization plus data-formatting passes
(BASELINE.md round-3 op profile). The color-match statistics force a
full-batch barrier, so a single megakernel is impossible, but TWO
kernels around that barrier cover everything after the LUT gather:

- **Phase 1** (grid over flat pixel tiles): trilinear interpolation from
  the compacted corner planes + LUT strength blend + RGB->CIELAB, writing
  LAB planes and per-tile partial sums (sum, sum of squares per channel
  per frame) for the statistics.
- **XLA between**: reduce the partials to per-frame mean/std and fold the
  whole color-match transfer into one affine map per channel:
  ``lab' = A*lab + B`` with ``A = s*sigma_ref/sigma + (1-s)``,
  ``B = s*(mu_ref - mu*sigma_ref/sigma)`` (a dozen scalars).
- **Phase 2** (grid over (frame, row-tile)): affine LAB transfer ->
  LAB->RGB -> clip -> unsharp (3x3 zero-border box mean, via a manually
  DMA'd row window with one halo row each side) -> hardware-PRNG film
  grain -> final clamp, writing channel planes.

Numerics: identical formulas to the XLA path (same colorspace constants,
same clip points); only reduction order (tile partials vs jnp.var) and
the grain stream differ. Grain keeps the determinism contract — noise
depends only on (seed + absolute frame index, row tile, position) — but
draws from the hardware PRNG stream like kernels/grain_pallas, so
outputs match the XLA path exactly only with grain disabled; with grain
they match distributionally. Locked by tests/test_grade_pallas.py
(interpret mode) and tests/tpu_checks.py (on chip).

Supported config shape: LUT(bundle) + optional elementwise adjust (the
11 non-spatial sliders; clarity/sharpen are rejected — their blur halos
over the 5.3x-padded gather read lose to the XLA fallback) + color
match + unsharp(zero) + optional grain — the benchmark's fused stack
plus the adjust stage. ops/grade.py falls back to the XLA path for
anything else. Frame-axis DP meshes run this path under shard_map with
per-shard absolute frame starts (parallel/mesh.py) — per-frame stats
and per-(frame, tile) grain seeding make shard boundaries invisible.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import colorspace as cs

LANES = 128


def _phase1_sublanes(pixels: int, batch: int) -> int:
    """Largest tile height (sublanes) that divides the flat pixel count
    AND keeps the double-buffered blocks inside VMEM.

    Big tiles amortize program boundaries (16-sublane tiles measured
    69 ms/4K-batch vs XLA's 62 — overhead, not math), but block bytes
    scale with the batch: (24B gather + 3B src) in + 3B lab out rows of
    (sub, 128) f32, double-buffered — batch 8 at 96 sublanes blew the
    16 MB VMEM budget (measured)."""
    rows = pixels // LANES
    budget = 12 * 1024 * 1024
    bytes_per_sublane = 2 * (30 * batch) * LANES * 4  # double-buffered
    max_sub = max(8, budget // max(1, bytes_per_sublane))
    for sub in (128, 96, 80, 64, 48, 40, 32, 24, 16, 8):
        if sub <= max_sub and rows % sub == 0:
            return sub
    return 8
P2_ROWS = 16              # phase-2 tile rows; part of the grain contract

_TWO_PI = 6.283185307179586


# --------------------------------------------------------------------------
# colorspace on channel-plane blocks (same constants as core/colorspace)
# --------------------------------------------------------------------------

def _lab_from_rgb_planes(r, g, b):
    def lin(x):
        return jnp.where(x > 0.04045, ((x + 0.055) / 1.055) ** 2.4,
                         x / 12.92)

    rl, gl, bl = lin(r), lin(g), lin(b)
    white = cs._XYZ_WHITE
    m = cs._RGB2XYZ
    t = [(rl * row[0] + gl * row[1] + bl * row[2]) / w
         for row, w in zip(m, white)]

    def ft(x):
        # Mosaic has no cbrt primitive; the branch is only selected for
        # x > eps ~ 0.009, where pow(x, 1/3) matches cbrt to ~1 ulp.
        root = jnp.maximum(x, 1e-30) ** (1.0 / 3.0)
        return jnp.where(x > cs._LAB_EPS, root,
                         cs._LAB_KAPPA * x + cs._LAB_OFFSET)

    fx, fy, fz = ft(t[0]), ft(t[1]), ft(t[2])
    return 116.0 * fy - 16.0, 500.0 * (fx - fy), 200.0 * (fy - fz)


def _rgb_from_lab_planes(lab_l, lab_a, lab_b):
    fy = (lab_l + 16.0) / 116.0
    fx = lab_a / 500.0 + fy
    fz = jnp.maximum(fy - lab_b / 200.0, 0.0)

    def t_of(f):
        # explicit multiplies: Mosaic lowers `f ** 3` as a pow
        return jnp.where(f > cs._LAB_FT_CUT, f * f * f,
                         (f - cs._LAB_OFFSET) / cs._LAB_KAPPA)

    white = cs._XYZ_WHITE
    xyz = [t_of(f) * w for f, w in zip((fx, fy, fz), white)]
    m = cs._XYZ2RGB

    def srgb(row):
        linear = jnp.maximum(
            xyz[0] * row[0] + xyz[1] * row[1] + xyz[2] * row[2], 0.0)
        return jnp.where(linear > 0.0031308,
                         1.055 * linear ** (1.0 / 2.4) - 0.055,
                         12.92 * linear)

    return srgb(m[0]), srgb(m[1]), srgb(m[2])


# --------------------------------------------------------------------------
# the elementwise adjust chain on channel planes
# --------------------------------------------------------------------------

def _apply_adjust_planes(planes, s, *, tile, sub: int, pad_width: int,
                         real_height: int, real_width: int):
    """The 13-slider adjust stack on three (sub, 128) channel planes, in
    flat-pixel layout — the elementwise 11 sliders only (reference math:
    ``VRGDG_LUTVideoTools.py:307-391``; same formulas as ops/adjust.py).

    The two spatial sliders (clarity's 9-tap reflect blur, sharpen's
    3-tap replicate blur) are rejected by ops/grade.py before this path
    is taken: their halo windows over the 5.3x-padded gather read would
    cost more than the XLA fallback (see BASELINE.md round-5).  Vignette
    needs per-pixel frame coordinates, recovered from the flat index the
    same way the stat mask derives them.  Sliders at zero are dead code
    (``s`` is trace-time static), matching the XLA path's gating.
    """
    r, g, b = [jnp.clip(p, 0.0, 1.0) for p in planes]

    if s.temperature != 0.0 or s.tint != 0.0:
        r = r + (s.temperature / 400.0 - s.tint / 900.0)
        g = g + (s.tint / 450.0)
        b = b + (-s.temperature / 400.0 - s.tint / 900.0)

    if s.exposure != 0.0:
        k = 2.0 ** (s.exposure / 100.0)
        r, g, b = r * k, g * k, b * k
    if s.contrast != 0.0:
        k = 1.0 + s.contrast / 100.0
        r = (r - 0.5) * k + 0.5
        g = (g - 0.5) * k + 0.5
        b = (b - 0.5) * k + 0.5

    if s.saturation != 0.0:
        gray = r * cs.LUMA_R + g * cs.LUMA_G + b * cs.LUMA_B
        k = 1.0 + s.saturation / 100.0
        r = gray + (r - gray) * k
        g = gray + (g - gray) * k
        b = gray + (b - gray) * k

    if s.highlights or s.shadows or s.whites or s.blacks:
        # one luma shared by all four masks, added sequentially — the
        # exact association order of the XLA path
        luma = r * cs.LUMA_R + g * cs.LUMA_G + b * cs.LUMA_B
        terms = []
        if s.highlights:
            terms.append(jnp.clip((luma - 0.55) / 0.45, 0.0, 1.0)
                         * (s.highlights / 220.0))
        if s.shadows:
            terms.append(jnp.clip((0.45 - luma) / 0.45, 0.0, 1.0)
                         * (s.shadows / 220.0))
        if s.whites:
            terms.append(jnp.clip((luma - 0.75) / 0.25, 0.0, 1.0)
                         * (s.whites / 240.0))
        if s.blacks:
            terms.append(jnp.clip((0.25 - luma) / 0.25, 0.0, 1.0)
                         * (s.blacks / 240.0))
        for term in terms:
            r, g, b = r + term, g + term, b + term

    fade = s.fade / 100.0
    if fade > 0.0:
        k0, k1 = 1.0 - fade * 0.35, fade * 0.18
        r, g, b = r * k0 + k1, g * k0 + k1, b * k0 + k1

    vignette = s.vignette / 100.0
    if vignette > 0.0:
        shape = (sub, LANES)
        flat = ((tile * sub
                 + jax.lax.broadcasted_iota(jnp.int32, shape, 0)) * LANES
                + jax.lax.broadcasted_iota(jnp.int32, shape, 1))
        h = (flat // pad_width).astype(jnp.float32)
        w = (flat % pad_width).astype(jnp.float32)
        yy = h * (2.0 / max(real_height - 1, 1)) - 1.0
        xx = w * (2.0 / max(real_width - 1, 1)) - 1.0
        distance = jnp.sqrt(xx * xx + yy * yy)
        mask = 1.0 - jnp.clip((distance - 0.35) / 1.05, 0.0, 1.0) \
            * vignette * 0.75
        r, g, b = r * mask, g * mask, b * mask

    return [jnp.clip(r, 0.0, 1.0), jnp.clip(g, 0.0, 1.0),
            jnp.clip(b, 0.0, 1.0)]


# --------------------------------------------------------------------------
# phase 1: trilerp + blend + LAB + stat partials
# --------------------------------------------------------------------------

def _phase1_kernel(domain_ref, g_ref, src_ref, lab_ref, part_ref, *,
                   batch: int, blend: float, max_index: int, sub: int,
                   real_height: int, real_width: int, pad_width: int):
    """Blocks: g (24B, S, 128) plane-major rows ((3j+c)*B + b);
    src (3B, S, 128) rows (channel*B + b); domain: SMEM (2, 3) carrying
    [dmin, span] per channel — lattice fracs are recomputed from src
    in-kernel, cheaper than round-tripping three frac planes to HBM;
    lab out (3B, S, 128) FRAME-major rows (b*3 + c);
    partials out: (1, 8, 128) block per tile — Mosaic cannot store
    scalars to VMEM, so the 6 sums per frame are placed on lanes
    ``b*8 + {0..5}`` of a lane-masked vector ([sL, sa, sb, sL2, sa2,
    sb2] per frame; every sublane carries the same value). When the
    frame was padded to the tile grid, pad pixels are excluded from the
    statistics by a flat-index mask."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    acc = jnp.zeros((8, LANES), jnp.float32)
    if real_width != pad_width or real_height % P2_ROWS:
        shape = (1, sub, LANES)
        flat = ((pl.program_id(0) * sub
                 + jax.lax.broadcasted_iota(jnp.int32, shape, 1)) * LANES
                + jax.lax.broadcasted_iota(jnp.int32, shape, 2))
        stat_weight = jnp.where(
            jnp.logical_and(flat % pad_width < real_width,
                            flat < real_height * pad_width), 1.0, 0.0)
    else:
        stat_weight = None
    for b in range(batch):

        def frac_of(axis, _b=b):
            # multiply by the precomputed reciprocal span: XLA computes
            # the gather cell from the SAME expression, and multiplies
            # (unlike divisions) round identically in both compilers, so
            # the in-kernel frac can never disagree with the cell floor
            coords = jnp.clip(
                (src_ref[axis * batch + _b] - domain_ref[0, axis])
                * domain_ref[1, axis], 0.0, 1.0) * float(max_index)
            return coords - jnp.floor(coords)

        fr, fg, fb = frac_of(0), frac_of(1), frac_of(2)
        out = []
        for c in range(3):
            def corner(j):
                return g_ref[(3 * j + c) * batch + b]

            c00 = corner(0) * (1.0 - fb) + corner(1) * fb
            c01 = corner(2) * (1.0 - fb) + corner(3) * fb
            c10 = corner(4) * (1.0 - fb) + corner(5) * fb
            c11 = corner(6) * (1.0 - fb) + corner(7) * fb
            c0 = c00 * (1.0 - fg) + c01 * fg
            c1 = c10 * (1.0 - fg) + c11 * fg
            graded = jnp.clip(c0 * (1.0 - fr) + c1 * fr, 0.0, 1.0)
            src = src_ref[c * batch + b]
            out.append(src * (1.0 - blend) + graded * blend)
        lab = _lab_from_rgb_planes(*out)
        for c in range(3):
            lab_ref[b * 3 + c] = lab[c]
            weighted = (lab[c] if stat_weight is None
                        else lab[c] * stat_weight)
            sq = (lab[c] * lab[c] if stat_weight is None
                  else lab[c] * lab[c] * stat_weight)
            acc += jnp.where(lane == b * 8 + c, jnp.sum(weighted), 0.0)
            acc += jnp.where(lane == b * 8 + 3 + c, jnp.sum(sq), 0.0)
    part_ref[0] = acc


# --------------------------------------------------------------------------
# phase 1, row-major variant: consume the gather output in its NATIVE
# (rows, 24) layout
# --------------------------------------------------------------------------

# Pixel sublane-tiles per row-major block (block = sub*128 px). Swept on
# the v5e (BASELINE.md round-4): 8 -> 56.3 ms/4K-batch, 16 -> 53.6,
# 32 -> 53.2, 64 -> 53.2; 32 is the plateau at half the VMEM (the
# lane-padded g block is sub*64 KiB, double-buffered). VRGDG_RM_SUB
# overrides for A/B sweeps (read at import; sweep in fresh processes —
# the jit cache ignores later env changes).
RM_SUB = int(os.environ.get("VRGDG_RM_SUB", "32"))


def _phase1_rowmajor_kernel(domain_ref, g_ref, src_ref, lab_ref, part_ref,
                            *, blend: float, max_index: int, sub: int,
                            real_height: int, real_width: int,
                            pad_width: int, masked: bool, adjust=None):
    """Grid (B, tiles). ``g_ref`` is a (sub*128, 24) block of the
    gather output in the custom call's OWN row-major layout — the XLA
    relayout copy that the plane-major kernel forces (~14 ms/4K-batch,
    BASELINE.md round-4) never happens.  The corner-major planes the
    trilerp wants are rebuilt in VMEM: each (128, 24) sublane chunk is
    transposed to (24, 128) (Mosaic lowers the narrow transpose
    in-register; an explicit zero-pad to a square (128, 128) tile
    measured identical), stacked, and the leading dims permuted to
    (24, sub, 128) — vreg shuffles on VMEM-resident data, vs an HBM
    round-trip of the 5.3x-padded gather tiles
    (tools/probe_transpose.py is the lowering probe).

    src block: (3, 1, 1, sub, 128); lab out (1, 3, 1, sub, 128);
    partials (1, 1, 8, 128) with lanes [sL, sa, sb, sL2, sa2, sb2]."""
    t = pl.program_id(1)
    chunks = []
    for s in range(sub):
        block = g_ref[pl.ds(s * LANES, LANES), :]          # (128, 24)
        chunks.append(jnp.transpose(block))                 # (24, 128)
    planes = jnp.transpose(jnp.stack(chunks, axis=0), (1, 0, 2))

    if masked:
        shape = (sub, LANES)
        flat = ((t * sub
                 + jax.lax.broadcasted_iota(jnp.int32, shape, 0)) * LANES
                + jax.lax.broadcasted_iota(jnp.int32, shape, 1))
        stat_weight = jnp.where(
            jnp.logical_and(flat % pad_width < real_width,
                            flat < real_height * pad_width), 1.0, 0.0)

    def frac_of(axis):
        coords = jnp.clip(
            (src_ref[axis, 0, 0] - domain_ref[0, axis])
            * domain_ref[1, axis], 0.0, 1.0) * float(max_index)
        return coords - jnp.floor(coords)

    fr, fg, fb = frac_of(0), frac_of(1), frac_of(2)
    out = []
    for c in range(3):
        def corner(j):
            return planes[3 * j + c]

        c00 = corner(0) * (1.0 - fb) + corner(1) * fb
        c01 = corner(2) * (1.0 - fb) + corner(3) * fb
        c10 = corner(4) * (1.0 - fb) + corner(5) * fb
        c11 = corner(6) * (1.0 - fb) + corner(7) * fb
        c0 = c00 * (1.0 - fg) + c01 * fg
        c1 = c10 * (1.0 - fg) + c11 * fg
        graded = jnp.clip(c0 * (1.0 - fr) + c1 * fr, 0.0, 1.0)
        src = src_ref[c, 0, 0]
        out.append(src * (1.0 - blend) + graded * blend)
    if adjust is not None:
        out = _apply_adjust_planes(out, adjust, tile=t, sub=sub,
                                   pad_width=pad_width,
                                   real_height=real_height,
                                   real_width=real_width)
    lab = _lab_from_rgb_planes(*out)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    acc = jnp.zeros((8, LANES), jnp.float32)
    for c in range(3):
        lab_ref[0, c, 0] = lab[c]
        weighted = lab[c] if not masked else lab[c] * stat_weight
        sq = weighted * lab[c]
        acc += jnp.where(lane == c, jnp.sum(weighted), 0.0)
        acc += jnp.where(lane == 3 + c, jnp.sum(sq), 0.0)
    part_ref[0, 0] = acc


# --------------------------------------------------------------------------
# phase 2: affine LAB transfer -> RGB -> unsharp -> grain
# --------------------------------------------------------------------------

def _uniform_from_bits(bits):
    # Mosaic has no uint32->float32 convert; see kernels/grain_pallas.
    mantissa = jax.lax.shift_right_logical(bits, jnp.uint32(9))
    f = pltpu.bitcast(mantissa | jnp.uint32(0x3F800000), jnp.float32)
    return 2.0 - f


def _phase2_kernel(coeff_ref, seed_ref, lab_hbm, out_ref, scratch, sem,
                   *, height: int, width: int, real_width: int,
                   sharpen_strength: float, grain_intensity: float,
                   saturation_mix: float):
    """Grid (B, H // P2_ROWS). ``lab_hbm`` is the padded (B, 3, H+2, W)
    LAB planes (one zero row top/bottom); scratch holds the DMA'd
    (3, P2_ROWS + 2, W) window. Output block: (1, 3, P2_ROWS, W)."""
    b = pl.program_id(0)
    t = pl.program_id(1)

    # DMA slice sizes must be 8-aligned along the sublane dim, so copy a
    # 24-row window (the array is padded to H + 8 rows); only the first
    # P2_ROWS + 2 rows (center + one halo each side) are consumed.
    dma = pltpu.make_async_copy(
        lab_hbm.at[b, :, pl.ds(t * P2_ROWS, P2_ROWS + 8), :],
        scratch, sem)
    dma.start()
    dma.wait()

    # Affine color-match transfer, then LAB -> RGB (clipped).
    lab = [scratch[c, :P2_ROWS + 2] * coeff_ref[b, c]
           + coeff_ref[b, 3 + c] for c in range(3)]
    rgb = [jnp.clip(p, 0.0, 1.0) for p in _rgb_from_lab_planes(*lab)]

    # Rows/cols outside the real frame contribute zero to the blur
    # (border "zero"); padded LAB went through the affine map, so mask
    # here (width pad columns exist when the frame was grid-padded).
    shape = rgb[0].shape  # (P2_ROWS + 2, W)
    row_global = (jax.lax.broadcasted_iota(jnp.int32, shape, 0)
                  + t * P2_ROWS - 1)
    in_frame = jnp.logical_and(row_global >= 0, row_global < height)
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    if real_width != width:
        in_frame = jnp.logical_and(in_frame, col < real_width)

    sharp = []
    for p in rgb:
        masked = jnp.where(in_frame, p, 0.0)
        # horizontal 3-tap with zero outside [0, W): circular rolls with
        # the wrapped column masked off
        left = jnp.where(col == 0, 0.0, pltpu.roll(masked, 1, axis=1))
        right = jnp.where(col == width - 1, 0.0,
                          pltpu.roll(masked, shape[1] - 1, axis=1))
        hsum = left + masked + right
        # vertical 3-tap over the halo window -> center rows only
        blur = (hsum[0:P2_ROWS] + hsum[1:P2_ROWS + 1]
                + hsum[2:P2_ROWS + 2]) / 9.0
        center = p[1:P2_ROWS + 1]
        sharp.append(jnp.clip(
            center + sharpen_strength * (center - blur), 0.0, 1.0))

    if grain_intensity > 0.0:
        pltpu.prng_seed(seed_ref[0] + b, t)
        tile_shape = sharp[0].shape  # (P2_ROWS, W)
        noise = []
        for _c in range(3):
            u1 = _uniform_from_bits(pltpu.bitcast(
                pltpu.prng_random_bits(tile_shape), jnp.uint32))
            u2 = _uniform_from_bits(pltpu.bitcast(
                pltpu.prng_random_bits(tile_shape), jnp.uint32))
            noise.append(jnp.sqrt(-2.0 * jnp.log(u1))
                         * jnp.cos(_TWO_PI * u2))
        gray = noise[1]
        for c, channel_scale in enumerate((2.0, 1.0, 3.0)):
            grain = (saturation_mix * noise[c] * channel_scale
                     + (1.0 - saturation_mix) * gray)
            out_ref[0, c] = jnp.clip(
                sharp[c] + grain * grain_intensity, 0.0, 1.0)
    else:
        for c in range(3):
            out_ref[0, c] = sharp[c]


def _phase2_flat_kernel(coeff_ref, seed_ref, lab_hbm, out_ref, scratch, sem,
                        *, wl: int, c_rows: int, dstart0: int, foff0: int,
                        win: int, real_height: int, real_width: int,
                        width: int, sharpen_strength: float,
                        grain_intensity: float, saturation_mix: float):
    """Phase 2 consuming phase 1's NATIVE flat (rows, 128) pixel layout.

    The padded-plane phase 2 forces two XLA data-formatting passes on the
    LAB planes (tiled->(B,3,H,W) relayout + the halo `jnp.pad` copy,
    ~1.2 ms/4K-batch, BASELINE.md round-4 op profile). Here the kernel
    DMAs its halo window straight out of phase 1's output (lead/tail pad
    tiles in that output keep every window in bounds), so the planes
    never round-trip through a row-major relayout. The 3x3 zero-border
    blur runs in flat-pixel space: vertical neighbors are +-``wl`` flat
    rows (``wl`` = lane-tiles per frame row), horizontal neighbors are
    lane rolls whose lane-0/127 wrap is patched from the adjacent flat
    row (one-row-shifted slices of the same rolled array).

    Grid (B, H // P2_ROWS). ``lab_hbm``: (B, 3, RP, 128) ANY, where
    scratch row r of tile t holds frame flat row ``t*c_rows + foff0 + r``
    (foff0 < 0: halo + DMA alignment lead). Output block: flat
    (1, 3, c_rows, 128). Grain draws per-(frame, tile) like the plane
    variant but in flat order, so the stream differs from the padded
    phase 2 by pixel position only (same distribution; the on-chip check
    is statistical and the determinism contract — noise depends only on
    seed + absolute frame index — is preserved)."""
    b = pl.program_id(0)
    t = pl.program_id(1)

    dma = pltpu.make_async_copy(
        lab_hbm.at[b, :, pl.ds(t * c_rows + dstart0, win), :],
        scratch, sem)
    dma.start()
    dma.wait()

    # Affine color-match transfer, then LAB -> RGB (clipped).
    lab = [scratch[c] * coeff_ref[b, c] + coeff_ref[b, 3 + c]
           for c in range(3)]
    rgb = [jnp.clip(p, 0.0, 1.0) for p in _rgb_from_lab_planes(*lab)]

    lane = jax.lax.broadcasted_iota(jnp.int32, (win, LANES), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (win, LANES), 0)
    # int division truncates toward zero, so keep the dividend
    # non-negative: shift by a whole number of frame rows covering the
    # halo/alignment lead, divide, then shift the row index back
    k_rows = -(-(-foff0) // wl)                    # static
    fpos = t * c_rows + (foff0 + k_rows * wl) + row
    q = fpos // wl
    h = q - k_rows                                 # frame row
    w = (fpos - q * wl) * LANES + lane             # padded-width column
    in_frame = jnp.logical_and(
        jnp.logical_and(h >= 0, h < real_height), w < real_width)

    # hsum rows cover [a, a+n): the blur halo of the c_rows center rows
    a = -foff0 - wl
    n = c_rows + 2 * wl
    o = -foff0                                     # center start
    sharp = []
    for p in rgb:
        xm = jnp.where(in_frame, p, 0.0)
        # build the neighbor arrays FULL-SIZE (sublane offset 0) and
        # slice afterwards: a `where` mixing rolls of differently-offset
        # sublane slices crashes Mosaic layout inference ("limits[i] <=
        # dim(i)"), while full-size rolls + where + late slices lower
        # fine (probed on-chip, see BASELINE.md round-4)
        rl = pltpu.roll(xm, 1, axis=1)
        rr = pltpu.roll(xm, LANES - 1, axis=1)
        ldown = pltpu.roll(rl, 1, axis=0)          # ldown[r] = rl[r-1]
        rup = pltpu.roll(rr, win - 1, axis=0)      # rup[r]  = rr[r+1]
        # lane 0's left neighbor is lane 127 of the previous flat row
        # (and symmetrically for lane 127); the true frame edges
        # (w == 0 / w == width-1) contribute zero. The axis-0 wrap rows
        # (0 and win-1) never land in [a, a+n).
        left = jnp.where(lane == 0, ldown, rl)
        left = jnp.where(w == 0, 0.0, left)
        right = jnp.where(lane == LANES - 1, rup, rr)
        right = jnp.where(w == width - 1, 0.0, right)
        hsum = left[a:a + n] + xm[a:a + n] + right[a:a + n]
        blur = (hsum[0:c_rows] + hsum[wl:wl + c_rows]
                + hsum[2 * wl:2 * wl + c_rows]) / 9.0
        center = p[o:o + c_rows]
        sharp.append(jnp.clip(
            center + sharpen_strength * (center - blur), 0.0, 1.0))

    if grain_intensity > 0.0:
        pltpu.prng_seed(seed_ref[0] + b, t)
        tile_shape = sharp[0].shape                # (c_rows, 128)
        noise = []
        for _c in range(3):
            u1 = _uniform_from_bits(pltpu.bitcast(
                pltpu.prng_random_bits(tile_shape), jnp.uint32))
            u2 = _uniform_from_bits(pltpu.bitcast(
                pltpu.prng_random_bits(tile_shape), jnp.uint32))
            noise.append(jnp.sqrt(-2.0 * jnp.log(u1))
                         * jnp.cos(_TWO_PI * u2))
        gray = noise[1]
        for c, channel_scale in enumerate((2.0, 1.0, 3.0)):
            grain = (saturation_mix * noise[c] * channel_scale
                     + (1.0 - saturation_mix) * gray)
            out_ref[0, c] = jnp.clip(
                sharp[c] + grain * grain_intensity, 0.0, 1.0)
    else:
        for c in range(3):
            out_ref[0, c] = sharp[c]


# --------------------------------------------------------------------------
# host-side wiring
# --------------------------------------------------------------------------

def supported_shape(height: int, width: int) -> bool:
    """Any positive shape: frames are grid-padded internally (pad pixels
    masked from the statistics and blur, output cropped)."""
    return height > 0 and width > 0


@functools.partial(
    jax.jit,
    static_argnames=("blend", "match_strength", "sharpen_strength",
                     "grain_intensity", "saturation_mix", "interpret",
                     "layout", "adjust", "emit"))
def fused_post_gather(frames, bundle, domain_min, domain_max, ref_mean,
                      ref_std, seed_plus_start, *, blend: float,
                      match_strength: float, sharpen_strength: float,
                      grain_intensity: float, saturation_mix: float,
                      interpret: bool = False, layout: str = "flat",
                      adjust=None, emit: str = "bhwc"):
    """The full post-gather stack for a BHWC [0,1] batch.

    XLA does coords + the corner-bundle gather (the gather itself stays
    at its proven issue-rate floor); the two Pallas phases replace the
    post-gather loop fusions. ``layout`` picks the inter-phase data
    movement: ``"flat"`` (default) consumes the gather's native
    (rows, 24) layout in phase 1 AND feeds phase 2 straight off the
    flat LAB rows (no relayout/pad copies; measured 52.5 vs
    53.2 ms/4K-batch and 54.2 vs 55.1 ms/1080p-batch-8 —
    tools/perf_lab.py flat modes); ``"rowmajor"`` keeps the padded
    (B, 3, H+2, W) plane phase 2; ``"plane"`` additionally takes the
    corner-major gather relayout copy (both kept for A/B).
    Returns BHWC float32.
    """
    from jax import lax

    from ..ops.lut import _BUNDLE_DNUMS

    batch, real_height, real_width, _ = frames.shape
    size = round(bundle.shape[0] ** (1.0 / 3.0))
    max_index = size - 1

    # Arbitrary shapes: pad to the (P2_ROWS, LANES) grid; pad pixels are
    # excluded from the color-match statistics in phase 1 and zeroed for
    # the blur in phase 2, and the output is cropped back, so results
    # match the unpadded math (locked by the odd-shape parity test).
    src = frames[..., :3].astype(jnp.float32)
    pad_h = (-real_height) % P2_ROWS
    pad_w = (-real_width) % LANES
    if pad_h or pad_w:
        src = jnp.pad(src, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    height, width = real_height + pad_h, real_width + pad_w
    pixels = height * width

    if layout not in ("plane", "rowmajor", "flat"):
        raise ValueError(f"Unknown layout {layout!r}")
    if adjust is not None and layout == "plane":
        # the legacy A/B layout's phase-1 kernel never grew the adjust
        # chain; production (flat/rowmajor) is where it matters
        raise ValueError("adjust requires layout='flat' or 'rowmajor'")
    if layout != "plane":
        sub = RM_SUB
        while pixels % (sub * LANES):
            sub //= 2
        sub = max(sub, 1)
        if layout == "flat" and sub % 8:
            # the flat phase 2 needs the (tiles, sub, 128) -> (rows, 128)
            # merge to be layout-free (sub a multiple of the sublane
            # tile).  Unreachable in normal flow — grid padding makes
            # pixels a multiple of 16*128, so the halving ladder from
            # RM_SUB stops at >=8; only a non-power-of-two VRGDG_RM_SUB
            # override can land here.  Kept to protect sweeps.
            layout = "rowmajor"
    else:
        sub = _phase1_sublanes(pixels, batch)
    tiles = pixels // (sub * LANES)

    # Everything below works in the kernel's tiled view from the start:
    # ONE channel-extraction transpose lands (3, B, tiles, sub, 128),
    # the coords/frac math stays in that layout, and the gather takes
    # 4-D batch indices so its output is ALREADY (24, B, tiles, sub,
    # 128) — the profiled round-1 version reshaped (24B, P) into tiles
    # after the fact, and those relayouts cost ~12 ms/4K-batch.
    pm = jnp.transpose(src.reshape(batch, tiles, sub, LANES, 3),
                       (4, 0, 1, 2, 3))
    inv_span = 1.0 / jnp.maximum(domain_max - domain_min, 1e-6)
    wide = (slice(None),) + (None,) * 4
    coords = (jnp.clip((pm - domain_min[wide]) * inv_span[wide], 0.0, 1.0)
              * max_index)
    lo = jnp.floor(coords).astype(jnp.int32)
    cell = (lo[2] * size + lo[1]) * size + lo[0]   # (B, tiles, sub, 128)
    # One gather for the whole batch. Splitting it into k tile-axis
    # slices (append-only concatenation in this layout) was measured and
    # rejected: 59.1 ms/4K-batch at k=3 and 59.3 at k=5 vs 54.4 single —
    # the lower row-issue rate at high row counts is not a per-call
    # artifact, and smaller gathers just multiply fixed per-call cost.
    domain = jnp.stack([domain_min.astype(jnp.float32),
                        inv_span.astype(jnp.float32)])    # (2, 3)

    if layout != "plane":
        # The gather lands in its NATIVE (rows, 24) layout — the same
        # tiled-padded form the custom call materializes anyway — and
        # phase 1 consumes it directly, rebuilding corner planes with
        # in-VMEM square transposes (see _phase1_rowmajor_kernel). The
        # ~14 ms/4K-batch XLA relayout copy plus the compact re-read
        # disappear; the kernel eats the 5.3x-padded HBM read instead
        # (which the relayout was paying too).
        rm_dnums = lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,),
            start_index_map=(0,))
        flat_cell = cell.reshape(-1)
        g = lax.gather(bundle, flat_cell[:, None], rm_dnums,
                       slice_sizes=(1, 24),
                       mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        g = g.astype(jnp.float32)                     # (B*pixels, 24)
        masked = bool(real_width != width or real_height % P2_ROWS)
        if layout == "flat":
            # lead/tail pad tiles on the tiles axis keep every flat
            # phase-2 DMA window (halo + 8-row alignment slack each way)
            # inside the array; the pad blocks are never written (their
            # garbage is masked off in phase 2)
            wl = width // LANES
            align_off = (-wl) % 8
            lead_tiles = -(-(wl + align_off + 8) // sub)
            tail_tiles = -(-(wl + 16) // sub)
        else:
            lead_tiles = tail_tiles = 0
        all_tiles = lead_tiles + tiles + tail_tiles
        lab_t, partials = pl.pallas_call(
            functools.partial(
                _phase1_rowmajor_kernel, blend=blend,
                max_index=max_index, sub=sub, real_height=real_height,
                real_width=real_width, pad_width=width, masked=masked,
                adjust=adjust),
            grid=(batch, tiles),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((sub * LANES, 24),
                             lambda b, t, _tiles=tiles:
                             (b * _tiles + t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, 1, 1, sub, LANES),
                             lambda b, t: (0, b, t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, 3, 1, sub, LANES),
                             lambda b, t, _lead=lead_tiles:
                             (b, 0, t + _lead, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 8, LANES),
                             lambda b, t: (b, t, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((batch, 3, all_tiles, sub, LANES),
                                     jnp.float32),
                jax.ShapeDtypeStruct((batch, tiles, 8, LANES),
                                     jnp.float32),
            ),
            interpret=pltpu.InterpretParams() if interpret else False,
        )(domain, g, pm)
        # lanes [0, 6) of sublane 0 carry [sL, sa, sb, sL2, sa2, sb2]
        sums = jnp.sum(partials[:, :, 0, :8], axis=1)     # (B, 8)
    else:
        g = lax.gather(bundle, cell[..., None], _BUNDLE_DNUMS,
                       slice_sizes=(1, 24),
                       mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        g = g.astype(jnp.float32)          # (24, B, tiles, sub, 128)

        # merging the two leading dims keeps the physical layout
        g_t = g.reshape(24 * batch, tiles, sub, LANES)
        src_t = pm.reshape(3 * batch, tiles, sub, LANES)

        lab_t, partials = pl.pallas_call(
            functools.partial(_phase1_kernel, batch=batch, blend=blend,
                              max_index=max_index, sub=sub,
                              real_height=real_height,
                              real_width=real_width,
                              pad_width=width),
            grid=(tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((24 * batch, 1, sub, LANES),
                             lambda t: (0, t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3 * batch, 1, sub, LANES),
                             lambda t: (0, t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((3 * batch, 1, sub, LANES),
                             lambda t: (0, t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, LANES), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((3 * batch, tiles, sub, LANES),
                                     jnp.float32),
                jax.ShapeDtypeStruct((tiles, 8, LANES), jnp.float32),
            ),
            interpret=pltpu.InterpretParams() if interpret else False,
        )(domain, g_t, src_t)

        # every sublane of a partials row carries the same masked value;
        # read sublane 0, lanes [0, 8B)
        sums = jnp.sum(partials[:, 0, :8 * batch],
                       axis=0).reshape(batch, 8)

    # -------- stats barrier: partials -> per-frame affine (A, B) --------
    n = float(real_height * real_width)
    mean = sums[:, 0:3] / n
    var = jnp.maximum(sums[:, 3:6] - n * mean * mean, 0.0) / (n - 1.0)
    std = jnp.sqrt(var) + 1e-5
    rmean = ref_mean.reshape(-1, 3)
    rstd = ref_std.reshape(-1, 3)
    gain = rstd / std
    a_coef = match_strength * gain + (1.0 - match_strength)
    b_coef = match_strength * (rmean - mean * gain)
    coeff = jnp.concatenate([a_coef, b_coef,
                             jnp.zeros((batch, 2), jnp.float32)], axis=1)

    if layout == "flat":
        # -------- phase 2 straight off the flat (rows, 128) planes ------
        # merging (tiles, sub) is layout-free (sub % 8 == 0), so the LAB
        # planes never pass through a row-major relayout or a pad copy
        rows_padded = all_tiles * sub
        lab_flat = lab_t.reshape(batch, 3, rows_padded, LANES)
        c_rows = P2_ROWS * wl
        lead_rows = lead_tiles * sub
        dstart0 = lead_rows - wl - align_off - 8
        foff0 = -(wl + align_off + 8)
        win = -(-(align_off + 16 + c_rows + 2 * wl) // 8) * 8
        out_flat = pl.pallas_call(
            functools.partial(
                _phase2_flat_kernel, wl=wl, c_rows=c_rows,
                dstart0=dstart0, foff0=foff0, win=win,
                real_height=real_height, real_width=real_width,
                width=width,
                sharpen_strength=sharpen_strength,
                grain_intensity=grain_intensity,
                saturation_mix=saturation_mix),
            grid=(batch, height // P2_ROWS),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, 3, c_rows, LANES),
                                   lambda b, t: (b, 0, t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (batch, 3, height * wl, LANES), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((3, win, LANES), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
            interpret=pltpu.InterpretParams() if interpret else False,
        )(coeff, seed_plus_start, lab_flat)
        planes = out_flat.reshape(batch, 3, height, width)
        if emit == "planes":
            # channel-plane output for the A/B probe of the final BHWC
            # transpose (tools/probe_emit.py): lets a uint8 consumer
            # transpose 4x fewer bytes.  A direct BHWC write from the
            # kernel is rejected by construction: a Mosaic output block
            # must tile the array's last two dims, and BHWC's minor dim
            # of 3 pads to 128 lanes — a ~42x write amplification.
            if pad_h or pad_w:
                planes = planes[:, :, :real_height, :real_width]
            return planes
        out = jnp.transpose(planes, (0, 2, 3, 1))
        if pad_h or pad_w:
            out = out[:, :real_height, :real_width, :]
        return out

    # -------- phase 2 over a padded (B, 3, H+2, W) plane layout --------
    lab_planes = lab_t.reshape(batch, 3, height, width)
    # 1 halo row on top; 7 extra bottom rows so every tile's DMA window
    # (P2_ROWS + 8 rows, 8-aligned) stays in bounds
    lab_padded = jnp.pad(lab_planes, ((0, 0), (0, 0), (1, 7), (0, 0)))

    out_planes = pl.pallas_call(
        functools.partial(
            _phase2_kernel, height=real_height, width=width,
            real_width=real_width,
            sharpen_strength=sharpen_strength,
            grain_intensity=grain_intensity,
            saturation_mix=saturation_mix),
        grid=(batch, height // P2_ROWS),
        in_specs=[
            # per-frame affine coefficients: whole (B, 8) scalar table in
            # SMEM, indexed by the frame program id in-kernel (blocked
            # specs must tile (8, 128) even in SMEM)
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 3, P2_ROWS, width),
                               lambda b, t: (b, 0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, 3, height, width),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((3, P2_ROWS + 8, width), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(coeff, seed_plus_start, lab_padded)

    out = jnp.transpose(out_planes, (0, 2, 3, 1))
    if pad_h or pad_w:
        out = out[:, :real_height, :real_width, :]
    return out
