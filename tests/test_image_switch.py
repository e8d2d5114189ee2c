"""Oracle fuzz: image-switch selection math vs ``VRGDGswtichNodes.py``.

The reference classes run on torch CPU tensors; ours on jnp arrays —
outputs compare as numpy.  Spec/map parsing fuzzes raw strings built
from a grammar that includes the reference's junk-token edge cases
(leading-dash, dangling range, nested dashes).
"""

import random
from typing import Dict, List, Optional, Tuple

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.reference_oracle import load_reference
from vrgdg_tpu.ops import image_switch as sw

REF_FILE = "VRGDGswtichNodes.py"


@pytest.fixture(scope="module")
def ref():
    return load_reference(
        REF_FILE,
        ["_parse_spec", "_parse_map", "_combine_images", "_ensure_compat",
         "_empty_image", "_empty_image_from_inputs", "_select_images",
         "VRGDG_ImageSwitch4", "VRGDG_ImageSwitchMultiDynamic",
         "VRGDG_ImageSwitchMultiDynamic002", "VRGDG_ImageIndexMap"],
        extra_globals={"torch": torch, "Dict": Dict, "List": List,
                       "Optional": Optional, "Tuple": Tuple})


def _random_spec(rng):
    tokens = []
    for _ in range(rng.randrange(0, 5)):
        kind = rng.random()
        if kind < 0.35:
            tokens.append(str(rng.randrange(-2, 8)))
        elif kind < 0.6:
            tokens.append(f"{rng.randrange(0, 7)}-{rng.randrange(0, 7)}")
        elif kind < 0.7:
            tokens.append(rng.choice(["-3", "3-", "1-2-3", "x", " "]))
        elif kind < 0.8:
            tokens.append(rng.choice(["all", "none", ""]))
        else:
            tokens.append(f" {rng.randrange(1, 5)} ")
    joiner = rng.choice([",", ";", " , "])
    return joiner.join(tokens)


def test_parse_spec_parity(ref):
    rng = random.Random(77)
    cases = ["", "none", "all", "0", "1,2,4", "4-1", "1--2", "-3", "3-",
             "2;3;2", "1, x, 2-2"] + [_random_spec(rng) for _ in range(300)]
    for spec in cases:
        assert sw.parse_index_spec(spec) == ref["_parse_spec"](spec), spec


def test_parse_map_parity(ref):
    rng = random.Random(78)
    for _ in range(120):
        lines = []
        for _ in range(rng.randrange(0, 6)):
            key = rng.choice([str(rng.randrange(0, 30)), "x", " 7 "])
            lines.append(f"{key}={_random_spec(rng)}"
                         if rng.random() < 0.85 else _random_spec(rng))
        text = rng.choice(["\n", ";"]).join(lines)
        assert sw.parse_index_map(text) == ref["_parse_map"](text), text


def _clip(rng, frames=1, h=6, w=8, c=3):
    return rng.random((frames, h, w, c)).astype(np.float32)


def _assert_same(ours, theirs):
    if ours is None:
        assert theirs is None
        return
    assert theirs is not None
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=0)


def test_switch4_parity(ref):
    rng = np.random.default_rng(0)
    spec_rng = random.Random(5)
    node = ref["VRGDG_ImageSwitch4"]()
    for _ in range(60):
        slots = [(_clip(rng, frames=spec_rng.randrange(1, 3))
                  if spec_rng.random() < 0.8 else None)
                 for _ in range(4)]
        spec = _random_spec(spec_rng)
        theirs = node.select(
            spec, *[None if s is None else torch.from_numpy(s)
                    for s in slots])[0]
        _assert_same(sw.switch_select(spec, slots), theirs)


def test_switch_dynamic_parity(ref):
    rng = np.random.default_rng(1)
    spec_rng = random.Random(6)
    plain = ref["VRGDG_ImageSwitchMultiDynamic"]()
    blank = ref["VRGDG_ImageSwitchMultiDynamic002"]()
    for _ in range(60):
        count = spec_rng.randrange(1, 8)
        slots = {i: _clip(rng) for i in range(1, count + 1)
                 if spec_rng.random() < 0.7}
        kwargs = {f"image{i}": torch.from_numpy(a)
                  for i, a in slots.items()}
        spec = spec_rng.choice(
            [_random_spec(spec_rng), "all", "0", "0,2", ""])
        _assert_same(sw.switch_dynamic(spec, count, slots),
                     plain.select(spec, count, **kwargs)[0])
        _assert_same(sw.switch_dynamic(spec, count, slots, blank_zero=True),
                     blank.select(spec, count, **kwargs)[0])


def test_index_map_parity(ref):
    rng = np.random.default_rng(2)
    spec_rng = random.Random(7)
    node = ref["VRGDG_ImageIndexMap"]()
    map_text = "1=1\n2=2\n10=1,4\n20=all\n6=none"
    for _ in range(60):
        slots = [(_clip(rng) if spec_rng.random() < 0.8 else None)
                 for _ in range(4)]
        index = spec_rng.randrange(0, 25)
        fallback = spec_rng.choice(["same", "2", "none", "1-3"])
        theirs = node.select(
            index, map_text, fallback,
            *[None if s is None else torch.from_numpy(s)
              for s in slots])[0]
        _assert_same(
            sw.switch_index_map(index, map_text, fallback, slots), theirs)


def test_combine_rejects_mismatch(ref):
    a = np.zeros((1, 4, 4, 3), np.float32)
    b = np.zeros((1, 4, 5, 3), np.float32)
    with pytest.raises(ValueError, match="same shape and dtype"):
        sw.combine_batches([a, b])
    with pytest.raises(Exception, match="same shape and dtype"):
        ref["_combine_images"]([torch.from_numpy(a), torch.from_numpy(b)])


def test_blank_frame_color_unpack(ref):
    ours = np.asarray(sw.blank_frame(width=5, height=3, color=0x336699))
    theirs = ref["_empty_image"](width=5, height=3, color=0x336699).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-7)


def test_parse_map_line_terminators(ref):
    """splitlines semantics: \\r and \\v break rows like the reference."""
    for text in ("1=1\r2=2", "1=1\x0b2=2", "1=1\r\n2=2;3=all"):
        assert sw.parse_index_map(text) == ref["_parse_map"](text), text
