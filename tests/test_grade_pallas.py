"""Two-phase Pallas fused grade (kernels/grade_pallas) vs the XLA path.

Runs in interpret mode on the CPU suite; the hardware PRNG is stubbed to
zeros there, so grain-on cases check plumbing/clipping only and the
numerics are locked with grain disabled (they share every other formula
with the XLA path — same trilerp, LAB constants, clip points; only the
stats reduction order differs). tests/tpu_checks.py repeats the
comparison on the real chip including grain statistics.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vrgdg_tpu.core.cube import build_palette_lut
from vrgdg_tpu.core.params import (ColorMatchParams, GrainParams, LUTParams,
                                   SharpenParams)
from vrgdg_tpu.ops.color_match import lab_statistics
from vrgdg_tpu.ops.grade import GradeConfig, grade


@pytest.fixture(scope="module")
def stack():
    lut = build_palette_lut("#0b1d51, #1f6aa5, #f3d27a", 17)
    rng = np.random.default_rng(3)
    frames = jnp.asarray(rng.uniform(0, 1, (2, 32, 256, 3))
                         .astype(np.float32))
    reference = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3))
                            .astype(np.float32))
    return lut, frames, lab_statistics(reference)


def _config(grain=None, **overrides):
    base = dict(
        lut=LUTParams.normalize(8.0),
        color_match=ColorMatchParams.normalize(0.7),
        sharpen=SharpenParams.normalize(1.5, border="zero"),
        grain=grain,
    )
    base.update(overrides)
    return GradeConfig(**base)


def test_fused_pallas_matches_xla_without_grain(stack):
    lut, frames, ref_stats = stack
    want = grade(frames, _config(), lut=lut, ref_stats=ref_stats)
    got = grade(frames, _config(fused_mode="pallas"), lut=lut,
                ref_stats=ref_stats)
    assert got.shape == want.shape and got.dtype == want.dtype
    err = float(jnp.max(jnp.abs(got - want)))
    # identical formulas; only the LAB stats reduce in tile partials
    assert err < 2e-5, err


def test_fused_pallas_partial_strengths(stack):
    lut, frames, ref_stats = stack
    config = _config(lut=LUTParams.normalize(3.5),
                     color_match=ColorMatchParams.normalize(0.25),
                     sharpen=SharpenParams.normalize(6.0, border="zero"))
    want = grade(frames, config, lut=lut, ref_stats=ref_stats)
    got = grade(frames, GradeConfig(**{**config.__dict__,
                                       "fused_mode": "pallas"}),
                lut=lut, ref_stats=ref_stats)
    assert float(jnp.max(jnp.abs(got - want))) < 2e-5


def test_fused_pallas_grain_plumbing(stack):
    """Interpreted PRNG emits zero bits -> Box-Muller yields a constant
    noise field; assert the path runs, stays in range, and differs from
    grain-off by a bounded amount."""
    lut, frames, ref_stats = stack
    grain = GrainParams.normalize(0.05, 0.5, seed=11)
    got = grade(frames, _config(grain=grain, fused_mode="pallas"),
                lut=lut, ref_stats=ref_stats, frame_start=7)
    base = grade(frames, _config(fused_mode="pallas"), lut=lut,
                 ref_stats=ref_stats)
    assert float(jnp.min(got)) >= 0.0 and float(jnp.max(got)) <= 1.0
    # zero-bit Box-Muller -> sqrt(-2 log 1) = 0 noise on u1=1... the
    # stubbed stream keeps the delta within the intensity budget either way
    assert float(jnp.max(jnp.abs(got - base))) <= 0.05 * 3.0 + 1e-6


def test_fused_pallas_rejects_unsupported(stack):
    lut, frames, ref_stats = stack
    with pytest.raises(ValueError, match="color-match"):
        grade(frames, GradeConfig(lut=LUTParams.normalize(8.0),
                                  sharpen=SharpenParams.normalize(
                                      1.5, border="zero"),
                                  fused_mode="pallas"),
              lut=lut, ref_stats=ref_stats)
    with pytest.raises(ValueError, match="border"):
        grade(frames, _config(sharpen=SharpenParams.normalize(1.5),
                              fused_mode="pallas"),
              lut=lut, ref_stats=ref_stats)


def test_fused_pallas_odd_shapes_match_xla(stack):
    """Grid-padded shapes (1080p-style heights, non-128 widths): pad
    pixels must not leak into the statistics or the blur border."""
    lut, _frames, ref_stats = stack
    rng = np.random.default_rng(8)
    for shape in ((1, 30, 200, 3), (2, 27, 129, 3), (1, 16, 127, 3),
                  (1, 54, 96, 3)):
        frames = jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32))
        want = grade(frames, _config(), lut=lut, ref_stats=ref_stats)
        got = grade(frames, _config(fused_mode="pallas"), lut=lut,
                    ref_stats=ref_stats)
        assert got.shape == want.shape
        err = float(jnp.max(jnp.abs(got - want)))
        assert err < 2e-5, (shape, err)


def test_fused_pallas_layouts_agree(stack):
    """All three data layouts must agree (grain off) — same math,
    different data movement: 'plane' (corner-major planes via the XLA
    relayout), 'rowmajor' (native gather consumption + padded-plane
    phase 2), and 'flat' (native gather consumption + phase 2 DMA'd
    straight off the flat LAB rows, no relayout/pad copies)."""
    from vrgdg_tpu.kernels.grade_pallas import fused_post_gather
    from vrgdg_tpu.ops.grade import _bundle_for

    lut, _frames, (ref_mean, ref_std) = stack
    bundle = _bundle_for(lut)
    dmin = jnp.zeros(3, jnp.float32)
    dmax = jnp.ones(3, jnp.float32)
    rng = np.random.default_rng(21)
    kw = dict(blend=0.8, match_strength=0.7, sharpen_strength=1.5,
              grain_intensity=0.0, saturation_mix=0.5, interpret=True)
    for shape in ((2, 32, 256, 3), (1, 30, 200, 3), (1, 37, 250, 3)):
        frames = jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32))
        seed = jnp.zeros(1, jnp.int32)
        plane = fused_post_gather(frames, bundle, dmin, dmax, ref_mean,
                                  ref_std, seed, layout="plane", **kw)
        rowm = fused_post_gather(frames, bundle, dmin, dmax, ref_mean,
                                 ref_std, seed, layout="rowmajor", **kw)
        flat = fused_post_gather(frames, bundle, dmin, dmax, ref_mean,
                                 ref_std, seed, layout="flat", **kw)
        err = float(jnp.max(jnp.abs(plane - rowm)))
        assert err < 1e-5, (shape, err)
        # flat shares phase 1 with rowmajor and every phase-2 formula;
        # only the data movement differs, so grain-off it is bit-equal
        err = float(jnp.max(jnp.abs(flat - rowm)))
        assert err == 0.0, (shape, err)


def test_fused_pallas_adjust_matches_xla(stack):
    """The 11 elementwise adjust sliders run inside phase 1 (between the
    LUT blend and the LAB conversion — they feed the color-match
    statistics exactly like the XLA stage order does)."""
    from vrgdg_tpu.core.params import AdjustSettings

    lut, frames, ref_stats = stack
    adjust = AdjustSettings.normalize(dict(
        temperature=22.0, tint=-9.0, saturation=18.0, exposure=-12.0,
        contrast=15.0, highlights=25.0, shadows=-30.0, whites=10.0,
        blacks=-8.0, fade=12.0, vignette=35.0))
    want = grade(frames, _config(adjust=adjust), lut=lut,
                 ref_stats=ref_stats)
    got = grade(frames, _config(adjust=adjust, fused_mode="pallas"),
                lut=lut, ref_stats=ref_stats)
    err = float(jnp.max(jnp.abs(got - want)))
    assert err < 2e-5, err
    # odd (grid-padded) shapes: the vignette/stat coordinate recovery
    # from flat indices must use the REAL frame dims, not the padded ones
    rng = np.random.default_rng(14)
    for shape in ((1, 30, 200, 3), (2, 27, 129, 3)):
        small = jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32))
        want = grade(small, _config(adjust=adjust), lut=lut,
                     ref_stats=ref_stats)
        got = grade(small, _config(adjust=adjust, fused_mode="pallas"),
                    lut=lut, ref_stats=ref_stats)
        err = float(jnp.max(jnp.abs(got - want)))
        assert err < 2e-5, (shape, err)


def test_fused_pallas_adjust_rejects_spatial_sliders(stack):
    from vrgdg_tpu.core.params import AdjustSettings

    lut, frames, ref_stats = stack
    for sliders in (dict(clarity=20.0), dict(sharpen=15.0)):
        adjust = AdjustSettings.normalize(dict(exposure=5.0, **sliders))
        with pytest.raises(ValueError, match="spatial sliders"):
            grade(frames, _config(adjust=adjust, fused_mode="pallas"),
                  lut=lut, ref_stats=ref_stats)
    # sliders at/below the XLA path's no-op gate (|slider| <= 0.1) pass
    adjust = AdjustSettings.normalize(dict(exposure=5.0, clarity=0.1))
    got = grade(frames, _config(adjust=adjust, fused_mode="pallas"),
                lut=lut, ref_stats=ref_stats)
    want = grade(frames, _config(adjust=adjust), lut=lut,
                 ref_stats=ref_stats)
    assert float(jnp.max(jnp.abs(got - want))) < 2e-5


def test_fused_pallas_dp_mesh_bit_identical(stack):
    """Frame-axis DP (shard_map) must reproduce the single-device fused
    Pallas output bit-for-bit: per-frame stats, per-(absolute frame,
    tile) grain seeding, and per-shard frame_start adjustment."""
    from vrgdg_tpu.core.params import AdjustSettings, GrainParams
    from vrgdg_tpu.parallel import grade_on_mesh, make_mesh

    lut, _frames, ref_stats = stack
    rng = np.random.default_rng(5)
    frames = jnp.asarray(rng.uniform(0, 1, (5, 32, 256, 3))
                         .astype(np.float32))
    adjust = AdjustSettings.normalize(dict(contrast=12.0, vignette=20.0))
    config = _config(adjust=adjust,
                     grain=GrainParams.normalize(0.05, 0.5, seed=11),
                     fused_mode="pallas")
    single = grade(frames, config, lut=lut, ref_stats=ref_stats,
                   frame_start=3)
    mesh = make_mesh(4)
    sharded = grade_on_mesh(frames, config, mesh, lut=lut,
                            ref_stats=ref_stats, frame_start=3)
    assert sharded.shape == frames.shape
    err = float(jnp.max(jnp.abs(sharded - single)))
    assert err == 0.0, err


def test_fused_pallas_rejected_on_spatial_mesh(stack):
    from vrgdg_tpu.parallel import grade_on_mesh, make_mesh

    lut, frames, ref_stats = stack
    mesh = make_mesh(4, spatial=2)
    with pytest.raises(ValueError, match="spatial"):
        grade_on_mesh(frames, _config(fused_mode="pallas"), mesh, lut=lut,
                      ref_stats=ref_stats, spatial=True)


def test_fused_pallas_rejects_large_batch_and_bad_mode(stack):
    lut, _frames, ref_stats = stack
    big = jnp.zeros((17, 16, 128, 3), jnp.float32)
    with pytest.raises(ValueError, match="16 frames"):
        grade(big, _config(fused_mode="pallas"), lut=lut,
              ref_stats=ref_stats)
    with pytest.raises(ValueError, match="Unknown fused_mode"):
        grade(jnp.zeros((1, 16, 128, 3), jnp.float32),
              _config(fused_mode="Pallas"), lut=lut, ref_stats=ref_stats)
