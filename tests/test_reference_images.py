"""Multi-reference conditioning image math vs the reference
(``VRGDG_GeneralNodes2.py:3773-4192``).

The VAE/conditioning halves are graph glue; the image math is fuzzed
here with the inject-and-capture oracle: the reference classes run with
``comfy.utils.common_upscale`` replaced by a torch implementation of
its documented contract (center-crop to target aspect with round-half-
even margins, then ``F.interpolate``), and the ported JAX path must
match the produced tensors at the bilinear parity budget.
"""

import json
from typing import List

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from tests.reference_oracle import load_reference
from vrgdg_tpu.ops import reference_images as ri


def _torch_common_upscale(calls):
    def common_upscale(samples, width, height, upscale_method, crop):
        calls.append((tuple(samples.shape), width, height,
                      upscale_method, crop))
        if crop == "center":
            old_h, old_w = samples.shape[2], samples.shape[3]
            old_aspect = old_w / old_h
            new_aspect = width / height
            x = y = 0
            if old_aspect > new_aspect:
                x = round((old_w - old_w * (new_aspect / old_aspect)) / 2)
            elif old_aspect < new_aspect:
                y = round((old_h - old_h * (old_aspect / new_aspect)) / 2)
            samples = samples[:, :, y:old_h - y, x:old_w - x]
        mode = {"nearest-exact": "nearest-exact", "bilinear": "bilinear",
                "bicubic": "bicubic", "area": "area"}[upscale_method]
        return F.interpolate(samples, size=(height, width), mode=mode)

    return common_upscale


def _oracle(calls):
    class _Utils:
        common_upscale = staticmethod(_torch_common_upscale(calls))

    class _Comfy:
        utils = _Utils

    ref = load_reference(
        "VRGDG_GeneralNodes2.py",
        ["VRGDG_MultiReferenceConditioning",
         "VRGDG_MultiReferenceConditioningFromPaths"],
        extra_globals={"comfy": _Comfy, "torch": torch, "List": List,
                       "folder_paths": None, "node_helpers": None})
    return ref


_PATH_TEXTS = [
    "", "   ", "a.png\nb.png", " 'quoted.png' \n \"two.png\" ",
    json.dumps(["x.png", "", {"path": "p.png"}, {"file": "f.png"},
                {"image": "i.png"}, {"other": 1}, 7]),
    json.dumps({"image_paths": ["a.jpg", " b.jpg "]}),
    json.dumps({"images": ["c.jpg"]}),
    json.dumps({"k1": "v1.png", "k2": {"path": "v2.png"}}),
    "not [json\nline2.png", json.dumps("single-string"), "123",
    "a.png\r\n\r\nb.png\rc.png",
]


def test_parse_image_paths_matches_reference():
    ref = _oracle([])["VRGDG_MultiReferenceConditioningFromPaths"]
    for text in _PATH_TEXTS:
        assert ri.parse_image_paths(text) == ref._parse_image_paths(text), \
            repr(text)
    assert ri.parse_image_paths(None) == ref._parse_image_paths(None)


def test_scale_dims_matches_reference_calls():
    calls = []
    node = _oracle(calls)["VRGDG_MultiReferenceConditioning"]
    rng = np.random.default_rng(5)
    for h, w, mp, steps in [(480, 640, 1.0, 1), (720, 1280, 0.25, 8),
                            (33, 47, 2.0, 32), (1080, 1920, 0.01, 1),
                            (64, 64, 16.0, 256), (100, 100, 1.0, 7)]:
        calls.clear()
        image = torch.from_numpy(
            rng.random((1, h, w, 3), dtype=np.float32))
        node._scale_to_total_pixels(image, "bilinear", mp, steps)
        (_, width, height, method, crop), = calls
        assert (height, width) == ri.scale_dims(h, w, mp, steps)
        assert method == "bilinear" and crop == "disabled"


def test_scale_to_total_pixels_matches_torch_oracle():
    calls = []
    node = _oracle(calls)["VRGDG_MultiReferenceConditioning"]
    rng = np.random.default_rng(9)
    for method in ("nearest-exact", "bilinear", "bicubic", "area"):
        x = rng.random((2, 37, 53, 3), dtype=np.float32)
        expected = node._scale_to_total_pixels(
            torch.from_numpy(x), method, 0.05, 4).numpy()
        ours = np.asarray(ri.scale_to_total_pixels(x, method, 0.05, 4))
        np.testing.assert_allclose(ours, expected, atol=2e-5)


def test_batch_reference_images_matches_torch_oracle():
    calls = []
    node = _oracle(calls)["VRGDG_MultiReferenceConditioning"]
    rng = np.random.default_rng(13)
    shapes = [(1, 48, 64, 3), (1, 32, 96, 4), (2, 48, 64, 3),
              (1, 80, 40, 3), (1, 48, 64, 1)]
    arrays = [rng.random(shape, dtype=np.float32) for shape in shapes]
    expected = node._batch_for_image_output(
        [torch.from_numpy(a) for a in arrays]).numpy()
    ours = np.asarray(ri.batch_reference_images(arrays))
    assert ours.shape == expected.shape
    np.testing.assert_allclose(ours, expected, atol=2e-5)

    single = node._batch_for_image_output([torch.from_numpy(arrays[0])])
    np.testing.assert_array_equal(
        np.asarray(ri.batch_reference_images([arrays[0]])), single.numpy())

    with pytest.raises(ValueError):
        ri.batch_reference_images([])

    # channel growth AFTER a narrower image was appended crashes the
    # reference's concatenation (only batched[0] is re-padded,
    # VRGDG_GeneralNodes2.py:3866-3872) — kept behavior, both sides fail
    crash = [rng.random((1, 8, 8, 3), dtype=np.float32),
             rng.random((1, 8, 8, 3), dtype=np.float32),
             rng.random((1, 8, 8, 4), dtype=np.float32)]
    with pytest.raises(RuntimeError):
        node._batch_for_image_output([torch.from_numpy(a) for a in crash])
    with pytest.raises(Exception):
        ri.batch_reference_images(crash)


def test_upscale_center_matches_torch_oracle():
    rng = np.random.default_rng(21)
    upscale = _torch_common_upscale([])
    for (sh, sw), (th, tw) in [((30, 90), (60, 60)), ((90, 30), (45, 45)),
                               ((64, 64), (48, 96)), ((50, 70), (50, 70))]:
        x = rng.random((1, sh, sw, 3), dtype=np.float32)
        expected = upscale(torch.from_numpy(x).movedim(-1, 1), tw, th,
                           "bilinear", "center").movedim(1, -1).numpy()
        ours = np.asarray(ri.upscale_center(x, th, tw))
        np.testing.assert_allclose(ours, expected, atol=2e-5)
