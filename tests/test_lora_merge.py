"""Numpy-oracle parity for the JAX LoRA merge
(``W + strength * (alpha/rank) * up @ down`` — the merge
``comfy.sd.load_lora_for_models`` performs for the reference loaders,
``VRGDG_GeneralNodes2.py:1916-1924``)."""

import numpy as np
import pytest

from vrgdg_tpu.ops import lora as lora_ops
from vrgdg_tpu.runtime import graph_plans


def _rand_lora(rng, shapes, rank=4, alpha=None):
    out = {}
    for name, shape in shapes.items():
        fan_out, fan_in = shape[0], int(np.prod(shape[1:]))
        out[name] = {
            "down": rng.standard_normal((rank, fan_in)).astype(np.float32),
            "up": rng.standard_normal((fan_out, rank)).astype(np.float32),
            "alpha": alpha,
        }
    return out


def test_merge_matches_numpy_oracle():
    rng = np.random.default_rng(7)
    shapes = {"dense/kernel": (16, 12), "conv/kernel": (8, 4, 3, 3)}
    params = {name: rng.standard_normal(shape).astype(np.float32)
              for name, shape in shapes.items()}
    for alpha, strength in [(None, 1.0), (2.0, 0.5), (8.0, -0.75)]:
        lora = _rand_lora(rng, shapes, rank=4, alpha=alpha)
        merged = lora_ops.merge_lora(params, lora, strength)
        for name, shape in shapes.items():
            scale = strength * (1.0 if alpha is None else alpha / 4.0)
            expected = params[name] + scale * (
                lora[name]["up"] @ lora[name]["down"]).reshape(shape)
            np.testing.assert_allclose(np.asarray(merged[name]), expected,
                                       atol=1e-5)


def test_merge_zero_strength_and_errors():
    rng = np.random.default_rng(3)
    params = {"w": rng.standard_normal((6, 5)).astype(np.float32)}
    lora = _rand_lora(rng, {"w": (6, 5)}, rank=2)
    merged = lora_ops.merge_lora(params, lora, 0.0)
    np.testing.assert_array_equal(np.asarray(merged["w"]), params["w"])

    with pytest.raises(KeyError):
        lora_ops.merge_lora(params, {"nope": lora["w"]}, 1.0)
    bad = {"w": {"down": lora["w"]["down"][:, :3], "up": lora["w"]["up"]}}
    with pytest.raises(ValueError):
        lora_ops.merge_lora(params, bad, 1.0)


def test_apply_lora_plan_two_pass_halving():
    """A plan from the ported loader applies first pass at half strength
    and second at full, sequentially in slot order."""
    rng = np.random.default_rng(11)
    params = {"w": rng.standard_normal((10, 10)).astype(np.float32)}
    loras = {"a.safetensors": _rand_lora(rng, {"w": (10, 10)}, rank=2),
             "b.safetensors": _rand_lora(rng, {"w": (10, 10)}, rank=3)}
    plan = graph_plans.multi_lora_plan({
        "use_custom_loras": True, "lora_count": 2,
        "ltx_two_pass_mode": True,
        "lora_1": "a.safetensors", "strength_1": 0.8,
        "lora_2": "b.safetensors", "strength_2": -0.4,
    })
    result = lora_ops.apply_lora_plan(params, plan, loras.__getitem__)

    def oracle(multiplier):
        w = params["w"].copy()
        for name, strength in [("a.safetensors", 0.8),
                               ("b.safetensors", -0.4)]:
            pair = loras[name]["w"]
            w = w + (strength * multiplier) * (pair["up"] @ pair["down"])
        return w

    np.testing.assert_allclose(np.asarray(result["first_pass"]["w"]),
                               oracle(0.5), atol=1e-5)
    np.testing.assert_allclose(np.asarray(result["second_pass"]["w"]),
                               oracle(1.0), atol=1e-5)


def test_apply_lora_plan_passthrough():
    params = {"w": np.zeros((2, 2), np.float32)}
    plan = graph_plans.multi_lora_plan({"use_custom_loras": False})
    result = lora_ops.apply_lora_plan(
        params, plan, lambda name: pytest.fail("must not load"))
    np.testing.assert_array_equal(np.asarray(result["first_pass"]["w"]),
                                  params["w"])
