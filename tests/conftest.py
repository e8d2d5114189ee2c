"""Test configuration: force an 8-device virtual CPU mesh.

Mirrors SURVEY.md §4's recommended strategy: multi-device behaviour is
tested on CPU-backed JAX with ``--xla_force_host_platform_device_count=8``
standing in for a TPU mesh, so the suite runs anywhere.

The environment's sitecustomize may pre-register a TPU platform plugin at
interpreter startup, so setting ``JAX_PLATFORMS`` via the environment is
not enough — ``jax.config.update`` after import is the reliable override.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
