"""The fused grade stack: one jitted device pass per frame batch.

This is the framework's flagship compute path and the unit the benchmark
measures (BASELINE.json: "fused grain+LUT+colormatch+sharpen").  Where the
reference runs each effect as a separate node/endpoint with two host<->GPU
hops per effect per micro-batch (e.g. ``nodes.py:49-61``), here the enabled
stages compose into a single function traced once and compiled by XLA into
fused HBM->VMEM passes — frames cross the host boundary once per batch.

Stage order (fixed, documented): LUT -> adjust -> color match -> sharpen ->
grain.  This matches the enhancer's sharpen-before-grain ordering
(``VRGDG_StandaloneVideoEnhancerNodes.py:284-293``); grain is applied last
so noise is never sharpened.

``GradeConfig`` is static under jit: disabled stages are dead-code, so a
sharpen-only grade compiles to exactly the sharpen math.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..core.params import (AdjustSettings, ColorMatchParams, GrainParams,
                           LUTParams, SharpenParams)
from .adjust import apply_adjust
from .color_match import lab_statistics, transfer_lab_statistics
from .grain import film_grain
from .lut import apply_lut, apply_lut_bundle
from .sharpen import laplacian_sharpen, sobel_sharpen, unsharp

_SHARPEN_FNS = {
    "unsharp": unsharp,
    "laplacian": laplacian_sharpen,
    "sobel": sobel_sharpen,
}

# Corner-bundle tables (~3.4 MB each for N=33) cached *device-resident*
# per source table object so production calls neither rebuild nor
# re-transfer them.  Entries hold the source object itself: as long as an
# entry is alive its id() cannot be recycled by a different table, which
# closes the stale-hit window id-only keying would have after GC.
_BUNDLE_CACHE: dict[int, tuple[object, object]] = {}


def _bundle_for(lut):
    from ..core.cube import LutData, corner_bundle

    source = lut.table if isinstance(lut, LutData) else lut
    key = id(source)
    entry = _BUNDLE_CACHE.get(key)
    if entry is not None and entry[0] is source:
        return entry[1]
    if len(_BUNDLE_CACHE) >= 8:
        _BUNDLE_CACHE.pop(next(iter(_BUNDLE_CACHE)))
    device_bundle = jnp.asarray(corner_bundle(source))
    _BUNDLE_CACHE[key] = (source, device_bundle)
    return device_bundle


@dataclass(frozen=True)
class GradeConfig:
    """Static description of which stages run and with what parameters.

    ``None`` disables a stage.  The LUT table and color-match reference
    statistics are runtime arrays (they may be large or computed on
    device) and are passed to :func:`grade` separately.
    """

    lut: LUTParams | None = None
    adjust: AdjustSettings | None = None
    color_match: ColorMatchParams | None = None
    sharpen: SharpenParams | None = None
    grain: GrainParams | None = None
    # "bundle" (default) = exact trilinear via ONE corner-bundle row-gather
    # per pixel (~6x faster on TPU, bit-identical for arbitrary inputs);
    # "reference" = the readable eight-corner-gather oracle path.
    lut_mode: str = "bundle"
    # "threefry" (default) = counter-based JAX PRNG, bit-identical across
    # any device/backend; "pallas" = the hardware-PRNG Pallas kernel
    # (kernels/grain_pallas) — same determinism contract and noise
    # statistics, different stream, TPU only (interpreted elsewhere).
    # threefry is RECOMMENDED at all production sizes: benched at 4K the
    # pallas_call boundary costs more than the hardware PRNG saves
    # (bench fused_4k_pallas_grain 30.3 vs 31.3 fps, r2; the gap does
    # not close at smaller frames because XLA fuses threefry grain into
    # the surrounding stack for free).  The kernel stays as the Mosaic
    # reference implementation and is rejected on mesh paths
    # (parallel/mesh.py) because its frame indexing uses pl.program_id.
    grain_mode: str = "threefry"
    # "xla" (default) = the post-gather stages run as XLA loop fusions;
    # "pallas" = the two-phase Pallas consumer (kernels/grade_pallas):
    # trilerp+adjust+LAB+stat-partials, then affine-transfer+unsharp+
    # grain.  Supported stack structure: LUT bundle + optional adjust
    # with the spatial sliders (clarity, sharpen) at zero + color match
    # + unsharp/zero + optional grain, 3-channel frames; any positive
    # H/W works — frames are grid-padded to the (16, 128) tile grid
    # inside the kernel wrapper and cropped back, with pad pixels
    # masked out of the color-match statistics.  Grain uses the
    # hardware PRNG stream (same determinism contract, different
    # stream), so outputs equal the XLA path exactly only with grain
    # disabled.  Mesh grades: frame-axis DP runs this path under
    # shard_map with per-shard absolute frame starts (bit-identical to
    # single-device, grain included); spatial sharding is rejected
    # (the kernel's tiling is per-frame).
    fused_mode: str = "xla"

    @property
    def any_enabled(self) -> bool:
        return any((self.lut, self.adjust, self.color_match,
                    self.sharpen, self.grain))


def _active_adjust(config: GradeConfig):
    """The adjust settings the fused Pallas kernel must apply, or None.

    Mirrors :func:`~vrgdg_tpu.ops.adjust.apply_adjust`'s early-out: a
    disabled or all-zero adjust stage is a no-op for in-contract [0,1]
    inputs (the XLA path's extra clamp only matters out of contract).
    """
    adjust = config.adjust
    if adjust is None or not adjust.enabled or adjust.is_identity:
        return None
    return adjust


def _fused_pallas_supported(config: GradeConfig, frames) -> str:
    """Empty string when the two-phase Pallas path can run, else why not."""
    from ..kernels.grade_pallas import supported_shape

    if config.lut is None or config.lut_mode != "bundle":
        return "fused_mode='pallas' needs the bundle LUT stage enabled"
    adjust = _active_adjust(config)
    if adjust is not None and (abs(adjust.clarity) > 0.1
                               or adjust.sharpen > 0.1):
        # the XLA path gates these blurs at |slider|/100 > 0.001; above
        # that they need 9-tap/3-tap halos whose redundant window reads
        # over the 5.3x-padded gather output lose to the XLA fallback
        return ("fused_mode='pallas' supports adjust only with the "
                "spatial sliders (clarity, sharpen) at zero")
    if config.color_match is None:
        return "fused_mode='pallas' needs the color-match stage enabled"
    if (config.sharpen is None or config.sharpen.kind != "unsharp"
            or config.sharpen.border != "zero"):
        return "fused_mode='pallas' needs sharpen kind='unsharp' border='zero'"
    if frames.shape[-1] != 3:
        return "fused_mode='pallas' needs 3-channel frames"
    if frames.shape[0] > 16:
        # phase-1 stat partials pack 8 lanes per frame into one 128-lane
        # vector (kernels/grade_pallas._phase1_kernel)
        return "fused_mode='pallas' supports at most 16 frames per batch"
    if not supported_shape(frames.shape[1], frames.shape[2]):
        return "fused_mode='pallas' needs positive frame dimensions"
    return ""


def _run_fused_pallas(frames, config: GradeConfig, lut_table, domain_min,
                      domain_max, ref_mean, ref_std, frame_start):
    """The fused Pallas path body (also the shard-local body on DP
    meshes, where ``frame_start`` carries the shard's absolute start)."""
    from ..kernels.grade_pallas import fused_post_gather

    reason = _fused_pallas_supported(config, frames)
    if reason:
        raise ValueError(reason)
    grain = config.grain if (config.grain is not None
                             and config.grain.intensity > 0) else None
    seed_plus_start = (
        jnp.asarray(0 if grain is None else grain.seed, jnp.int32)
        + frame_start.astype(jnp.int32)).reshape(1)
    return fused_post_gather(
        frames, lut_table, domain_min, domain_max, ref_mean, ref_std,
        seed_plus_start,
        blend=min(max(float(config.lut.strength), 0.0), 10.0) / 10.0,
        match_strength=float(config.color_match.match_strength),
        sharpen_strength=float(config.sharpen.strength),
        grain_intensity=0.0 if grain is None else float(grain.intensity),
        saturation_mix=(0.5 if grain is None
                        else float(grain.saturation_mix)),
        adjust=_active_adjust(config),
        interpret=jax.default_backend() != "tpu")


@partial(jax.jit, static_argnames=("config",))
def _grade_impl(frames, config: GradeConfig, lut_table, domain_min,
                domain_max, ref_mean, ref_std, frame_start):
    if config.fused_mode not in ("xla", "pallas"):
        # reject typos loudly — a silent XLA fallback would hand someone
        # benchmarking the pallas path the wrong numbers
        raise ValueError(
            f"Unknown fused_mode {config.fused_mode!r}; expected 'xla' "
            "or 'pallas'.")
    if config.fused_mode == "pallas":
        return _run_fused_pallas(frames, config, lut_table, domain_min,
                                 domain_max, ref_mean, ref_std, frame_start)
    out = frames
    if config.lut is not None:
        if config.lut_mode == "bundle":
            out = apply_lut_bundle(out, lut_table, domain_min, domain_max,
                                   strength=config.lut.strength)
        else:
            out = apply_lut(out, lut_table, domain_min, domain_max,
                            strength=config.lut.strength)
    if config.adjust is not None:
        out = apply_adjust(out, config.adjust)
    if config.color_match is not None:
        out = transfer_lab_statistics(out, ref_mean, ref_std,
                                      config.color_match.match_strength)
    if config.sharpen is not None and config.sharpen.strength > 0:
        fn = _SHARPEN_FNS[config.sharpen.kind]
        out = fn(out, config.sharpen.strength, config.sharpen.border)
    if config.grain is not None and config.grain.intensity > 0:
        if config.grain_mode == "pallas":
            from ..kernels.grain_pallas import film_grain_pallas

            out = film_grain_pallas(out, config.grain.intensity,
                                    config.grain.saturation_mix,
                                    config.grain.seed,
                                    frame_start=frame_start)
        else:
            out = film_grain(out, config.grain.intensity,
                             config.grain.saturation_mix, config.grain.seed,
                             frame_start=frame_start)
    return out


def grade(frames: jnp.ndarray, config: GradeConfig, *, lut=None,
          reference=None, ref_stats=None, frame_start=0) -> jnp.ndarray:
    """Run the configured grade stack over a BHWC [0,1] batch.

    Args:
      frames: ``(B, H, W, C>=3)`` float32 batch.
      config: static :class:`GradeConfig`.
      lut: :class:`~vrgdg_tpu.core.cube.LutData` or ``(N,N,N,3)`` table
        (required when ``config.lut`` is set).
      reference: reference image batch for color match; or pass
        precomputed ``ref_stats=(mean, std)`` from
        :func:`~vrgdg_tpu.ops.color_match.lab_statistics`.
      frame_start: absolute index of ``frames[0]`` for seeded grain.
    """
    if not config.any_enabled:
        return frames
    table, dmin, dmax, ref_mean, ref_std = prepare_operands(
        config, lut=lut, reference=reference, ref_stats=ref_stats)
    return _grade_impl(frames, config, table, dmin, dmax, ref_mean, ref_std,
                       jnp.asarray(frame_start, jnp.uint32))


def prepare_operands(config: GradeConfig, *, lut=None, reference=None,
                     ref_stats=None):
    """Resolve the runtime arrays a grade config needs: the (bundled) LUT
    table with its domain, and the color-match reference statistics.
    Shared by the single-device path and the mesh paths."""
    from ..core.cube import LutData  # local import to avoid cycle at init

    table = dmin = dmax = None
    if config.lut is not None:
        if lut is None:
            raise ValueError("config.lut is set but no LUT was provided.")
        if isinstance(lut, LutData):
            dmin = jnp.asarray(lut.domain_min)
            dmax = jnp.asarray(lut.domain_max)
        else:
            dmin = jnp.zeros(3, jnp.float32)
            dmax = jnp.ones(3, jnp.float32)
        if config.lut_mode == "bundle":
            table = _bundle_for(lut)
        elif isinstance(lut, LutData):
            table = jnp.asarray(lut.table)
        else:
            table = jnp.asarray(lut)
    else:
        table = jnp.zeros((2, 2, 2, 3), jnp.float32)
        dmin = jnp.zeros(3, jnp.float32)
        dmax = jnp.ones(3, jnp.float32)

    if config.color_match is not None:
        if ref_stats is not None:
            ref_mean, ref_std = ref_stats
        elif reference is not None:
            ref_mean, ref_std = lab_statistics(jnp.asarray(reference))
        else:
            raise ValueError(
                "config.color_match is set but neither reference nor "
                "ref_stats was provided.")
        ref_mean = jnp.asarray(ref_mean)
        ref_std = jnp.asarray(ref_std)
    else:
        ref_mean = jnp.zeros((1, 1, 1, 3), jnp.float32)
        ref_std = jnp.ones((1, 1, 1, 3), jnp.float32)

    return table, dmin, dmax, ref_mean, ref_std
