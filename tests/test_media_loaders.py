"""Folder loader behavior vs the reference contracts.

Reference: /root/reference/GeneralVideoNodes.py:2754-2979
(IndexedImageFromFolder, ..._ForRemakeMode), nodes.py:1327-1377
(VRGDG_LoadVideos).
"""

import os
import random

import numpy as np
import pytest

from vrgdg_tpu.runtime import media_loaders as ml


@pytest.fixture()
def image_folder(tmp_path):
    from PIL import Image

    # Deliberately shuffled creation order; numeric order is 1, 2, 10.
    for name, level in [("shot_00010_.png", 200), ("shot_00001_.png", 10),
                        ("img2.jpg", 100)]:
        Image.new("RGB", (8, 6), (level, level, level)).save(tmp_path / name)
    (tmp_path / "notes.txt").write_text("ignored")
    return str(tmp_path)


def test_numeric_sort_order(image_folder):
    assert ml.list_images(image_folder) == [
        "shot_00001_.png", "img2.jpg", "shot_00010_.png"]


def test_indexed_load_and_wraparound(image_folder):
    frame, picked = ml.indexed_image_from_folder(image_folder, 0)
    assert frame.shape == (1, 6, 8, 3)
    assert picked == 0
    assert abs(float(frame.mean()) - 10 / 255.0) < 1e-3
    # index 4 wraps to 4 % 3 == 1 -> img2.jpg
    frame, picked = ml.indexed_image_from_folder(image_folder, 4)
    assert picked == 1
    assert abs(float(frame.mean()) - 100 / 255.0) < 1e-3


def test_random_after_end_avoids_recent_picks(tmp_path):
    from PIL import Image

    # 4+ files: the reference's `len(choices) > 2` guard
    # (GeneralVideoNodes.py:2822-2824) then excludes BOTH of the last two
    # picks; with 3 files it only excludes the older one.
    for i in range(4):
        Image.new("RGB", (4, 4), (i, i, i)).save(
            tmp_path / f"f_{i + 1}.png")
    history: list[int] = []
    rng = random.Random(0)
    picks = []
    for _ in range(16):
        _, picked = ml.indexed_image_from_folder(
            str(tmp_path), index=99, random_after_end=True,
            history=history, rng=rng)
        picks.append(picked)
    for a, b in zip(picks, picks[1:]):
        assert a != b  # never the immediately previous pick
    for a, b in zip(picks, picks[2:]):
        assert a != b  # never the pick from two draws ago either
    assert set(picks) == {0, 1, 2, 3}
    assert len(history) == 2


def test_numbered_image_matches_index_plus_one(image_folder):
    frame = ml.numbered_image_from_folder(image_folder, 1)  # number 2
    assert abs(float(frame.mean()) - 100 / 255.0) < 1e-3
    with pytest.raises(FileNotFoundError):
        ml.numbered_image_from_folder(image_folder, 5)  # no number 6


def test_missing_folder_and_empty_folder(tmp_path):
    with pytest.raises(FileNotFoundError):
        ml.list_images(str(tmp_path / "nope"))
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(FileNotFoundError):
        ml.list_images(str(empty))


def test_load_videos_from_folder(tmp_path):
    import cv2

    for name, frames in [("a.mp4", 5), ("b.mp4", 3), ("c.mp4", 4)]:
        writer = cv2.VideoWriter(str(tmp_path / name),
                                 cv2.VideoWriter_fourcc(*"mp4v"),
                                 12.0, (32, 16))
        for i in range(frames):
            writer.write(np.full((16, 32, 3), 20 * (i + 1), np.uint8))
        writer.release()
    batch = ml.load_videos_from_folder(str(tmp_path), scene_count=2)
    assert batch.shape == (8, 16, 32, 3)  # a(5) + b(3), c excluded
    assert batch.dtype == np.float32
    assert 0.0 <= batch.min() and batch.max() <= 1.0
    with pytest.raises(FileNotFoundError):
        ml.load_videos_from_folder(str(tmp_path / "none"))


def test_image_batch_from_paths(tmp_path):
    from PIL import Image

    paths = []
    for i in range(3):
        p = tmp_path / f"img{i}.png"
        Image.new("RGB", (8, 6), (i * 40, 0, 0)).save(p)
        paths.append(str(p))
    batch = ml.image_batch_from_paths(paths + ["  "])  # blanks skipped
    assert batch.shape == (3, 6, 8, 3)
    assert abs(float(batch[2, 0, 0, 0]) - 80 / 255.0) < 1e-3
    odd = tmp_path / "odd.png"
    Image.new("RGB", (4, 4)).save(odd)
    with pytest.raises(ValueError, match="share dimensions"):
        ml.image_batch_from_paths(paths + [str(odd)])
    with pytest.raises(ValueError):
        ml.image_batch_from_paths([])
