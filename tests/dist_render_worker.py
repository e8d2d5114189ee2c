"""Worker subprocess for the distributed segment-scheduler test.

Run as ``python dist_render_worker.py <rank> <count> <base> <source>``.
Each process renders its ``rank::count`` share of the enhancer segments
into the SHARED job folder; rank 0 waits for the full committed set and
finalizes (``vrgdg_tpu.jobs.enhancer.render_job_shards``). Prints the
output path on rank 0.
"""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vrgdg_tpu.jobs import enhancer  # noqa: E402

SETTINGS = {
    "upscale_resolution": "original",
    "sharpen_strength": 1.5,
    "grain_enabled": True,
    "grain_intensity": 0.06,
    "seed": 11,
    "segment_seconds": 5,
    "preserve_audio": False,
    "output_name": "dist_out",
}


def main():
    rank, count = int(sys.argv[1]), int(sys.argv[2])
    base, source = sys.argv[3], sys.argv[4]
    registry = enhancer.JobRegistry()
    result = enhancer.render_job_shards(
        "dist_job", {"source_path": source, "settings": dict(SETTINGS)},
        rank, count, registry=registry, base_folder=base,
        wait_timeout=240.0)
    if rank == 0:
        print(f"OUTPUT={result['output_path']}", flush=True)
    print(f"rank{rank} SHARDS OK", flush=True)


if __name__ == "__main__":
    main()
