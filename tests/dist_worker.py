"""Worker subprocess for the 2-process jax.distributed test.

Run as ``python dist_worker.py <rank> <port>``.  Each process owns 2
virtual CPU devices; after :func:`initialize_distributed` the job spans
4 global devices and a cross-process global reduction must see every
shard (SURVEY.md section 5.8).
"""
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
from jax.experimental import multihost_utils
from jax.sharding import PartitionSpec

from vrgdg_tpu.parallel import make_mesh
from vrgdg_tpu.parallel.distributed import initialize_distributed


def main():
    rank, port = int(sys.argv[1]), sys.argv[2]
    summary = initialize_distributed(f"127.0.0.1:{port}", 2, rank)
    assert summary["initialized"], summary
    assert summary["process_count"] == 2
    assert jax.process_index() == rank
    assert jax.device_count() == 4, jax.device_count()
    assert jax.local_device_count() == 2

    mesh = make_mesh(4)
    local = jnp.arange(2.0) + 10.0 * rank  # rank0 [0,1], rank1 [10,11]
    shards = multihost_utils.host_local_array_to_global_array(
        local, mesh, PartitionSpec(mesh.axis_names[0]))
    result = float(jax.jit(jnp.sum)(shards))
    assert result == 22.0, result  # saw both processes' shards
    multihost_utils.sync_global_devices("vrgdg-dist-test")
    print(f"rank{rank} OK result={result}", flush=True)

    # Phase 2: a REAL frame-axis-sharded grade across both processes —
    # each rank contributes its local half of the clip, the seeded-grain
    # + sharpen stack runs once under GSPMD over the global mesh, and
    # the replicated result must be bit-identical to a single-device
    # full-batch grade (the multi-host form of the shard-invariance
    # contract in tests/test_grade.py / test_enhancer_mesh.py).
    import numpy as np

    from vrgdg_tpu.core.params import GrainParams, SharpenParams
    from vrgdg_tpu.ops import GradeConfig, grade

    cfg = GradeConfig(sharpen=SharpenParams.normalize(2.0),
                      grain=GrainParams.normalize(0.08, 0.5, seed=21))
    full = np.random.default_rng(0).uniform(
        0.0, 1.0, (8, 12, 16, 3)).astype(np.float32)  # same on both ranks
    local_frames = full[rank * 4:(rank + 1) * 4]
    spec = PartitionSpec(mesh.axis_names[0])
    global_frames = multihost_utils.host_local_array_to_global_array(
        local_frames, mesh, spec)
    step = jax.jit(lambda x: grade(x, cfg))
    sharded_out = step(global_frames)
    gathered = multihost_utils.global_array_to_host_local_array(
        sharded_out, mesh, PartitionSpec())  # replicate to every host
    reference = np.asarray(step(jnp.asarray(full)))  # single-device path
    np.testing.assert_array_equal(np.asarray(gathered), reference)
    multihost_utils.sync_global_devices("vrgdg-dist-grade")
    print(f"rank{rank} GRADE OK shape={tuple(np.asarray(gathered).shape)}",
          flush=True)


if __name__ == "__main__":
    main()
