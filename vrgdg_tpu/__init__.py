"""vrgdg_tpu — a TPU-native video post-processing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
``vrgamegirl19/comfyui-vrgamedevgirl`` ComfyUI pack: film grain, 3D .cube
LUTs, LAB color match, sharpening, the 13-slider adjust stack, resampling
with exact restore, feathered paste-back, and the segmented/checkpointed
Standalone Video Enhancer — as fused kernels over BHWC [0,1] float32 frame
tensors, sharded over TPU meshes.

Layers (SURVEY.md §1 -> this package):
  L1 kernels  -> :mod:`vrgdg_tpu.ops` (jnp) + :mod:`vrgdg_tpu.kernels` (Pallas)
  L2 media IO -> :mod:`vrgdg_tpu.runtime`
  L3 jobs     -> :mod:`vrgdg_tpu.jobs`
  L4 HTTP API -> :mod:`vrgdg_tpu.server`
  L5/L6       -> :mod:`vrgdg_tpu.api` (library surface) + :mod:`vrgdg_tpu.cli`
  parallelism -> :mod:`vrgdg_tpu.parallel`
"""

__version__ = "0.4.0"

from . import core, ops
from .core.params import (AdjustSettings, ColorMatchParams, EnhancerSettings,
                          GrainParams, LUTParams, SharpenParams)
from .ops.grade import GradeConfig, grade

__all__ = [
    "core", "ops", "AdjustSettings", "ColorMatchParams", "EnhancerSettings",
    "GrainParams", "LUTParams", "SharpenParams", "GradeConfig", "grade",
    "__version__",
]
