"""Device-mesh sharding for the grade stack.

The reference has no distributed execution of any kind (SURVEY.md §2.7) —
its long-video answer is serial temporal segmentation.  This module adds
the core TPU-native capability on top of the same math:

- **frame-axis data parallelism** ("data"): frames of a clip are sharded
  across chips with ``NamedSharding(P("data"))``.  Every op in the grade
  stack is frame-local, and grain is per-frame seeded
  (``vrgdg_tpu.ops.grain``), so this is embarrassingly parallel — zero
  collectives in the compiled kernel, and bit-identical to single-chip
  output by construction.
- **spatial parallelism** ("space"): for frames too large for one chip's
  HBM, the height axis is additionally sharded.  GSPMD then auto-inserts
  the only collectives the stack needs: halo exchange (collective-permute)
  for the 3x3/9x9 stencils and ``psum`` for color-match LAB statistics —
  no hand-written NCCL-style code, exactly the XLA-collectives design of
  SURVEY.md §5.8.

Multi-host: call :func:`jax.distributed.initialize` before building the
mesh; device order follows ``jax.devices()`` so ICI-adjacent chips carry
adjacent frame shards.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(n_devices: int | None = None, spatial: int = 1,
              devices=None) -> Mesh:
    """Build a ``(data, space)`` mesh over the first ``n_devices`` devices.

    ``spatial`` chips cooperate on each frame (height-sharded); the rest of
    the mesh parallelizes over frames.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:int(n_devices)]
    spatial = max(1, int(spatial))
    if len(devices) % spatial:
        raise ValueError(
            f"{len(devices)} devices do not divide into spatial groups of {spatial}.")
    grid = np.array(devices).reshape(len(devices) // spatial, spatial)
    return Mesh(grid, (DATA_AXIS, SPACE_AXIS))


def frame_sharding(mesh: Mesh, spatial: bool = False) -> NamedSharding:
    """Sharding for a BHWC clip: frames over "data", optionally height over
    "space"."""
    spec = P(DATA_AXIS, SPACE_AXIS if spatial else None)
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(frames: jnp.ndarray, multiple: int,
                    axis: int = 0) -> tuple[jnp.ndarray, int]:
    """Pad ``axis`` up to a multiple (repeating the last slice) so a clip
    divides evenly over the mesh; returns (padded, original_length)."""
    length = frames.shape[axis]
    remainder = length % multiple
    if remainder == 0:
        return frames, length
    pad = multiple - remainder
    last = jax.lax.slice_in_dim(frames, length - 1, length, axis=axis)
    filler = jnp.concatenate([last] * pad, axis=axis)
    return jnp.concatenate([frames, filler], axis=axis), length


def shard_clip(frames: jnp.ndarray, mesh: Mesh,
               spatial: bool = False) -> tuple[jnp.ndarray, int]:
    """Place a BHWC clip on the mesh (padding the frame axis to divide
    evenly); returns (sharded_frames, original_frame_count)."""
    data_size = mesh.shape[DATA_AXIS]
    frames, count = pad_to_multiple(frames, data_size, axis=0)
    if spatial:
        space = mesh.shape[SPACE_AXIS]
        if frames.shape[1] % space:
            raise ValueError(
                f"Frame height {frames.shape[1]} must divide the spatial "
                f"axis size {space}.")
    placed = jax.device_put(frames, frame_sharding(mesh, spatial))
    return placed, count


def grade_on_mesh(frames: jnp.ndarray, config, mesh: Mesh, *, lut=None,
                  reference=None, ref_stats=None, frame_start=0,
                  spatial: bool = False) -> jnp.ndarray:
    """Run the grade stack over a mesh-sharded clip.

    Output is bit-identical to the single-device :func:`vrgdg_tpu.ops.grade`
    for frame-axis sharding (per-frame seeded grain makes shard boundaries
    invisible); spatially sharded runs match to float tolerance (stats
    reductions reassociate).
    """
    from ..ops.grade import grade

    if getattr(config, "fused_mode", "xla") == "pallas":
        if spatial:
            raise ValueError(
                "fused_mode='pallas' supports frame-axis data parallelism "
                "only (its tiling is per-frame); use spatial=False or the "
                "default 'xla' fused mode.")
        return _grade_fused_pallas_dp(frames, config, mesh, lut=lut,
                                      reference=reference,
                                      ref_stats=ref_stats,
                                      frame_start=frame_start)
    if getattr(config, "grain_mode", "threefry") == "pallas" and \
            getattr(config, "grain", None) is not None:
        # The Pallas kernel derives absolute frame indices from
        # pl.program_id, which would break the (seed + absolute frame
        # index) determinism contract if XLA ever partitioned the opaque
        # call across the frame axis; threefry grain is sharding-exact.
        raise ValueError(
            "grain_mode='pallas' is not supported on mesh-sharded grades; "
            "use the default 'threefry' mode (bit-identical across "
            "shard boundaries).")
    placed, count = shard_clip(frames, mesh, spatial)
    out = grade(placed, config, lut=lut, reference=reference,
                ref_stats=ref_stats, frame_start=frame_start)
    return out[:count]


def _grade_fused_pallas_dp(frames, config, mesh, *, lut, reference,
                           ref_stats, frame_start):
    """Frame-axis DP for the fused Pallas grade.

    GSPMD cannot partition an opaque ``pallas_call``, so the kernel runs
    under ``shard_map``: each device grades its local frame shard with
    ``frame_start`` advanced to the shard's absolute first frame.  The
    color-match statistics are per-frame and grain is seeded per
    (absolute frame, tile) inside the kernel, so every (frame, tile)
    program computes exactly what the single-device launch computes —
    output is bit-identical to :func:`vrgdg_tpu.ops.grade.grade` with
    ``fused_mode='pallas'``, grain included (locked by
    tests/test_grade_pallas.py on the virtual CPU mesh).
    """
    from ..ops.grade import prepare_operands

    if not config.any_enabled:
        return frames
    placed, count = shard_clip(frames, mesh, spatial=False)
    table, dmin, dmax, ref_mean, ref_std = prepare_operands(
        config, lut=lut, reference=reference, ref_stats=ref_stats)
    out = _fused_pallas_dp_impl(
        placed, table, dmin, dmax, ref_mean, ref_std,
        jnp.asarray(frame_start, jnp.uint32), config=config, mesh=mesh)
    return out[:count]


@partial(jax.jit, static_argnames=("config", "mesh"))
def _fused_pallas_dp_impl(frames, table, dmin, dmax, ref_mean, ref_std,
                          frame_start, *, config, mesh):
    from ..ops.grade import _run_fused_pallas

    def local(fr, tb, dn, dx, rm, rs, fs):
        shard = jax.lax.axis_index(DATA_AXIS)
        start = fs + (shard * fr.shape[0]).astype(fs.dtype)
        return _run_fused_pallas(fr, config, tb, dn, dx, rm, rs, start)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(DATA_AXIS), P(), P(), P(), P(), P(), P()),
        out_specs=P(DATA_AXIS),
        # the body is trivially replicated over the unused "space" axis,
        # but the opaque pallas_call defeats the VMA inference
        check_vma=False,
    )(frames, table, dmin, dmax, ref_mean, ref_std, frame_start)
