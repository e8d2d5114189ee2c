"""LoRA weight merging over JAX parameter trees.

The reference applies its LoRA plans through ComfyUI's patcher
(``comfy.sd.load_lora_for_models`` at ``VRGDG_GeneralNodes2.py:1923``),
which folds each low-rank pair into the target weight as
``W + strength * (alpha / rank) * up @ down``.  This module is the
TPU-native equivalent for the plans produced by
:mod:`vrgdg_tpu.runtime.graph_plans`: a pure functional merge over a
flat ``{name: array}`` tree, jit-safe (static key set, static shapes)
so a merged model re-uses the un-merged model's compiled step.

Merging at load time (rather than running ``x @ (W + BA)`` factored) is
the right TPU call: one fused MXU matmul per layer at apply time and
zero extra HBM traffic per step afterwards.
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp

__all__ = ["merge_lora", "apply_lora_plan"]


def _delta(weight, down, up, alpha, strength):
    """``strength * (alpha / rank) * up @ down`` shaped like ``weight``.

    ``down`` is ``(rank, fan_in...)`` flattened to 2-D, ``up`` is
    ``(fan_out..., rank)``; conv-style weights merge through the same
    2-D product reshaped back (the standard safetensors LoRA layout).
    ``alpha=None`` means ``alpha == rank`` (scale 1), the common
    trainer default.
    """
    down2 = jnp.asarray(down, jnp.float32)
    up2 = jnp.asarray(up, jnp.float32)
    rank = down2.shape[0]
    if up2.shape[-1] != rank:
        raise ValueError(
            f"rank mismatch: down rank {rank} vs up rank {up2.shape[-1]}")
    down2 = down2.reshape(rank, -1)
    up2 = up2.reshape(-1, rank)
    scale = float(strength) * (
        1.0 if alpha is None else float(alpha) / float(rank))
    # One-time load-time fold: full f32 MXU precision (the TPU default
    # would run the product through bf16 passes — ~1e-2 weight error,
    # visible in generation parity; measured 3.5e-2 abs on a rank-4 fold).
    delta = jnp.matmul(up2, down2,
                       precision=jax.lax.Precision.HIGHEST) * scale
    if delta.size != weight.size:
        raise ValueError(
            f"LoRA pair produces {delta.shape} for weight "
            f"{tuple(weight.shape)}")
    return delta.reshape(weight.shape)


def merge_lora(params: Mapping[str, jnp.ndarray],
               lora: Mapping[str, Mapping],
               strength: float) -> dict:
    """Fold one LoRA into ``params`` at ``strength``.

    ``lora`` maps a parameter name to ``{"down", "up", "alpha"}``;
    names absent from ``params`` raise (a silently dropped pair is the
    classic wrong-key LoRA bug).  ``strength == 0`` returns the input
    mapping unchanged, mirroring the reference loaders' zero-strength
    skip (``VRGDG_GeneralNodes2.py:1919-1921``).
    """
    if float(strength) == 0.0 or not lora:
        return dict(params)
    missing = sorted(set(lora) - set(params))
    if missing:
        raise KeyError(f"LoRA targets absent from params: {missing}")
    merged = dict(params)
    for name, pair in lora.items():
        weight = jnp.asarray(merged[name])
        delta = _delta(weight, pair["down"], pair["up"],
                       pair.get("alpha"), strength)
        merged[name] = (weight.astype(jnp.float32) + delta).astype(
            weight.dtype)
    return merged


def apply_lora_plan(params: Mapping[str, jnp.ndarray],
                    plan: Mapping,
                    load_lora) -> dict:
    """Apply a :func:`~vrgdg_tpu.runtime.graph_plans.multi_lora_plan` /
    ``two_pass_lora_plan`` result to a parameter tree.

    ``load_lora(name)`` resolves a plan entry's LoRA name to its
    ``{param: {down, up, alpha}}`` tensors (file loading stays with the
    caller — the reference's in-memory cache lives at
    ``VRGDG_GeneralNodes2.py:1888-1892``).  Returns ``{"first_pass",
    "second_pass"}`` merged trees; a passthrough plan returns the input
    mapping for both, like the reference's unpatched-model fast path.
    """
    if plan.get("passthrough"):
        base = dict(params)
        return {"first_pass": base, "second_pass": dict(params)}
    out = {}
    for key in ("first_pass", "second_pass"):
        merged = dict(params)
        for name, strength in plan[key]:
            merged = merge_lora(merged, load_lora(name), strength)
        out[key] = merged
    return out
