"""Multi-host initialization: `jax.distributed` wiring + env contract.

The reference has no distributed execution (SURVEY.md section 2.7); this
is the TPU-native addition for multi-host pods/slices.  On Cloud TPU,
``jax.distributed.initialize()`` discovers everything from the TPU
metadata server, so the zero-config call is the default; for DCN-connected
multi-slice or non-TPU coordinators, the explicit settings come from
arguments or this env contract:

=====================================  =====================================
Environment variable                   Meaning
=====================================  =====================================
``VRGDG_TPU_COORDINATOR``              ``host:port`` of process 0's
                                       coordinator service
``VRGDG_TPU_NUM_PROCESSES``            total process count in the job
``VRGDG_TPU_PROCESS_ID``               this process's rank, 0-based
``VRGDG_TPU_LOCAL_DEVICE_IDS``         optional comma list restricting
                                       which local devices this process
                                       owns (e.g. ``0,1``)
=====================================  =====================================

Call :func:`initialize_distributed` once per process before any other JAX
use (the CLI's ``--distributed`` flag on ``serve``/``enhance`` does this);
afterwards ``jax.devices()`` spans the whole job and
:func:`vrgdg_tpu.parallel.make_mesh` builds global meshes — device order
follows ``jax.devices()``, so ICI-adjacent chips carry adjacent frame
shards and DCN only sees the per-segment host fan-out.
"""

from __future__ import annotations

import os

_INITIALIZED = False

ENV_COORDINATOR = "VRGDG_TPU_COORDINATOR"
ENV_NUM_PROCESSES = "VRGDG_TPU_NUM_PROCESSES"
ENV_PROCESS_ID = "VRGDG_TPU_PROCESS_ID"
ENV_LOCAL_DEVICE_IDS = "VRGDG_TPU_LOCAL_DEVICE_IDS"


def distributed_config(coordinator_address: str | None = None,
                       num_processes: int | None = None,
                       process_id: int | None = None,
                       local_device_ids=None,
                       environ=None) -> dict:
    """Resolve the initialize() kwargs from arguments, falling back to the
    env contract above.  Pure (injectable ``environ``) so it is unit
    testable without a cluster."""
    env = os.environ if environ is None else environ

    def pick(value, key, convert=str):
        if value is not None:
            return value
        raw = env.get(key)
        if raw is None or str(raw).strip() == "":
            return None
        return convert(str(raw).strip())

    config: dict = {}
    coordinator = pick(coordinator_address, ENV_COORDINATOR)
    if coordinator:
        config["coordinator_address"] = coordinator
    count = pick(num_processes, ENV_NUM_PROCESSES, int)
    if count is not None:
        config["num_processes"] = int(count)
    rank = pick(process_id, ENV_PROCESS_ID, int)
    if rank is not None:
        config["process_id"] = int(rank)
    ids = local_device_ids
    if ids is None:
        raw = env.get(ENV_LOCAL_DEVICE_IDS)
        if raw and str(raw).strip():
            ids = [int(part) for part in str(raw).split(",") if part.strip()]
    if ids is not None:
        config["local_device_ids"] = list(ids)

    explicit = {"coordinator_address", "num_processes", "process_id"}
    given = explicit.intersection(config)
    if given and given != explicit:
        missing = sorted(explicit - given)
        raise ValueError(
            "Incomplete multi-host configuration: "
            f"{', '.join(sorted(given))} set but {', '.join(missing)} "
            f"missing. Set all three (or none, for TPU-metadata "
            "autodiscovery).")
    return config


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None,
                           local_device_ids=None, *,
                           _initialize=None) -> dict:
    """Initialize `jax.distributed` once per process and return a summary
    ``{"initialized", "config", "process_index", "process_count"}``.

    Idempotent: repeat calls return the existing state.  ``_initialize``
    is an injection point for tests.
    """
    global _INITIALIZED

    import jax

    config = distributed_config(coordinator_address, num_processes,
                                process_id, local_device_ids)
    if _INITIALIZED:
        return {"initialized": False, "already": True, "config": config,
                "process_index": jax.process_index(),
                "process_count": jax.process_count()}
    init = _initialize if _initialize is not None \
        else jax.distributed.initialize
    init(**config)
    _INITIALIZED = True
    return {"initialized": True, "config": config,
            "process_index": jax.process_index(),
            "process_count": jax.process_count()}
