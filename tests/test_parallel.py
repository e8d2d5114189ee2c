import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vrgdg_tpu.core.cube import build_palette_lut
from vrgdg_tpu.core.params import (ColorMatchParams, GrainParams, LUTParams,
                                   SharpenParams)
from vrgdg_tpu.ops.grade import GradeConfig, grade
from vrgdg_tpu.parallel import (grade_on_mesh, make_mesh, pad_to_multiple,
                                shard_clip)


def _imgs(seed=0, shape=(8, 16, 16, 3)):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32))


CFG = GradeConfig(
    lut=LUTParams.normalize(7.0),
    sharpen=SharpenParams.normalize(1.5),
    grain=GrainParams.normalize(0.06, 0.5, seed=9),
)
LUT = build_palette_lut("#0b1d51, #f3d27a", 17)


def test_eight_devices_available():
    assert jax.device_count() >= 8  # conftest forces 8 virtual CPU devices


def test_frame_sharded_grade_bit_identical():
    mesh = make_mesh(8)
    imgs = _imgs()
    single = grade(imgs, CFG, lut=LUT)
    sharded = grade_on_mesh(imgs, CFG, mesh, lut=LUT)
    np.testing.assert_array_equal(np.asarray(single), np.asarray(sharded))


def test_uneven_clip_pads_and_trims():
    mesh = make_mesh(8)
    imgs = _imgs(1, (11, 8, 8, 3))  # 11 does not divide 8
    single = grade(imgs, CFG, lut=LUT)
    sharded = grade_on_mesh(imgs, CFG, mesh, lut=LUT)
    assert sharded.shape == single.shape
    np.testing.assert_array_equal(np.asarray(single), np.asarray(sharded))


def test_spatial_sharding_with_color_match():
    """Height-sharded frames force GSPMD halo exchange for the stencil and
    psum for LAB statistics; result matches single-device to float tol."""
    mesh = make_mesh(8, spatial=4)
    imgs = _imgs(2, (4, 32, 16, 3))
    ref = _imgs(3, (1, 16, 16, 3))
    cfg = GradeConfig(color_match=ColorMatchParams.normalize(0.8),
                      sharpen=SharpenParams.normalize(2.0))
    single = grade(imgs, cfg, reference=ref)
    sharded = grade_on_mesh(imgs, cfg, mesh, reference=ref, spatial=True)
    assert np.max(np.abs(np.asarray(single) - np.asarray(sharded))) < 1e-5


def test_pad_to_multiple():
    imgs = _imgs(4, (5, 4, 4, 3))
    padded, count = pad_to_multiple(imgs, 8)
    assert padded.shape[0] == 8 and count == 5
    np.testing.assert_array_equal(np.asarray(padded[5]), np.asarray(imgs[4]))
    same, count = pad_to_multiple(imgs, 5)
    assert same.shape[0] == 5 and count == 5


def test_shard_clip_places_on_mesh():
    mesh = make_mesh(8)
    placed, count = shard_clip(_imgs(5), mesh)
    assert count == 8
    assert len(placed.sharding.device_set) == 8


def test_mesh_shapes():
    mesh = make_mesh(8, spatial=2)
    assert mesh.shape["data"] == 4 and mesh.shape["space"] == 2
    with pytest.raises(ValueError):
        make_mesh(6, spatial=4)


def test_grade_on_mesh_rejects_pallas_grain():
    """The Pallas grain kernel derives frame indices from pl.program_id,
    so mesh-sharded grades must refuse it (determinism contract)."""
    import jax
    import jax.numpy as jnp
    import pytest

    from vrgdg_tpu.core.params import GrainParams
    from vrgdg_tpu.ops.grade import GradeConfig
    from vrgdg_tpu.parallel import grade_on_mesh, make_mesh

    config = GradeConfig(grain=GrainParams(intensity=0.05),
                         grain_mode="pallas")
    frames = jnp.zeros((8, 8, 8, 3), jnp.float32)
    with pytest.raises(ValueError, match="pallas"):
        grade_on_mesh(frames, config, make_mesh())
