import numpy as np
import pytest

from vrgdg_tpu.ops.face import (FaceCandidate, crop_face, dedup_candidates,
                                iou, make_candidate, padded_square_box,
                                select_candidate, tile_regions)


def _cand(x, y, w, h, conf, fw=100, fh=100):
    return make_candidate(x, y, w, h, conf, fw, fh)


def test_tile_regions():
    assert tile_regions(500, 400) == [(0, 0, 500, 400)]
    regions = tile_regions(1000, 800)
    assert len(regions) == 5
    assert regions[0] == (0, 0, 1000, 800)
    assert regions[1] == (0, 0, 600, 480)          # 60% tiles
    assert regions[4] == (400, 320, 1000, 800)


def test_iou():
    a = _cand(0, 0, 10, 10, 0.9)
    b = _cand(5, 5, 10, 10, 0.8)
    assert abs(iou(a, b) - 25 / 175) < 1e-9
    assert iou(a, _cand(50, 50, 10, 10, 0.5)) == 0.0


def test_dedup_keeps_highest_confidence():
    a = _cand(0, 0, 20, 20, 0.95)
    dup = _cand(2, 2, 20, 20, 0.80)   # IoU > 0.35 with a
    other = _cand(60, 60, 20, 20, 0.70)
    kept = dedup_candidates([dup, a, other])
    assert a in kept and other in kept and dup not in kept


def test_selection_modes():
    small_conf = _cand(10, 10, 10, 10, 0.99)
    big = _cand(50, 50, 40, 40, 0.80)
    central = _cand(45, 45, 12, 12, 0.75)
    cands = [small_conf, big, central]
    assert select_candidate(cands, "highest_confidence") is small_conf
    assert select_candidate(cands, "largest") is big
    assert select_candidate(cands, "closest_to_center") is central
    with pytest.raises(ValueError, match="No face"):
        select_candidate([], "largest")


def test_padded_square_box_shifts_inside():
    # face near the left edge: box must shift right, not shrink
    cand = _cand(2, 40, 20, 20, 0.9)
    left, top, right, bottom = padded_square_box(cand, 100, 100, 0.40, 24)
    assert right - left == bottom - top  # square
    assert left >= 0 and right <= 100
    side = round(20 * 1.8)
    assert right - left == side

    # tiny face: expands to minimum
    cand = _cand(50, 50, 6, 6, 0.9)
    left, top, right, bottom = padded_square_box(cand, 100, 100, 0.0, 24)
    assert right - left >= 24


def test_crop_face_with_fake_detector():
    rng = np.random.default_rng(0)
    image = rng.uniform(0, 1, (1, 120, 160, 3)).astype(np.float32)

    def detector(frame, region):
        # one face at (40, 30) 30x30, only reported for the full frame
        if region == (0, 0, 160, 120):
            return [(40, 30, 30, 30, 0.92), (41, 31, 30, 30, 0.50)]
        return []

    crop, crop_data, conf = crop_face(image, detector, confidence=0.7,
                                      crop_padding_factor=0.2,
                                      minimum_face_pixels=10)
    (cw, ch), (left, top, right, bottom) = crop_data
    assert conf == 0.92
    assert cw == ch == right - left == bottom - top
    assert crop.shape == (1, ch, cw, 3)
    np.testing.assert_allclose(np.asarray(crop)[0],
                               image[0, top:bottom, left:right])


def test_crop_face_respects_minimum_and_confidence():
    image = np.zeros((1, 50, 50, 3), np.float32)

    def detector(frame, region):
        return [(5, 5, 4, 4, 0.99),     # too small
                (20, 20, 20, 20, 0.3)]  # low confidence

    with pytest.raises(ValueError, match="No face"):
        crop_face(image, detector, confidence=0.7, minimum_face_pixels=10,
                  long_range=False)
