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


if __name__ == "__main__":
    main()
