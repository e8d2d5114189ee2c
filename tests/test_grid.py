"""Reference-sheet grid compositor (VRGDG_LTXICIngredientsGrid.py)."""

import numpy as np
import pytest

from vrgdg_tpu.ops import grid


def _imgs(n, h=24, w=32):
    rng = np.random.default_rng(0)
    return [rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
            for _ in range(n)]


def _check_rects(rects, count):
    assert len(rects) == count
    for x, y, w, h in rects:
        assert -1e-6 <= x <= 1.0 and -1e-6 <= y <= 1.0
        assert w > 0 and h > 0
        assert x + w <= 1.0 + 1e-6 and y + h <= 1.0 + 1e-6


def test_grid_rects_auto_columns():
    rects = grid.grid_rects(6)
    _check_rects(rects, 6)
    # auto for 6 targets 16:9 -> ceil(sqrt(6*16/9)) = 4 columns
    assert rects[0][2] == pytest.approx(1 / 4)


def test_layout_presets_cover_counts():
    for preset in grid.LAYOUTS:
        if preset == "aspect_rows":
            continue
        for count in (1, 3, 5, 6, 7, 9):
            _check_rects(grid.layout_rects(preset, count), count)


def test_strip_layouts():
    rects = grid.layout_rects("horizontal_strip", 4)
    assert rects[1] == (0.25, 0.0, 0.25, 1.0)
    rects = grid.layout_rects("vertical_strip", 4)
    assert rects[2] == (0.0, 0.5, 1.0, 0.25)


def test_aspect_rows_single_and_multi():
    assert grid.aspect_row_rects([(24, 32)], 768, 448) == \
        [(0.0, 0.0, 1.0, 1.0)]
    shapes = [(24, 32), (24, 48), (48, 24), (24, 24), (30, 40)]
    _check_rects(grid.aspect_row_rects(shapes, 768, 448), 5)


def test_build_sheet_geometry_and_background():
    images = _imgs(4)
    sheet = grid.build_reference_sheet(
        images, layout="uniform_grid", output_width=256, output_height=128,
        columns=2, gutter=4, outer_padding=8, corner_radius=0,
        background_color="#102030")
    assert sheet.shape == (1, 128, 256, 3)
    # outer padding stays background
    np.testing.assert_allclose(sheet[0, 0, 0],
                               [0x10 / 255, 0x20 / 255, 0x30 / 255],
                               atol=1e-6)


def test_build_sheet_cover_crop_fills_panel():
    images = _imgs(1, h=10, w=40)  # very wide image into a square panel
    sheet = grid.build_reference_sheet(
        images, layout="uniform_grid", output_width=64, output_height=64,
        gutter=0, outer_padding=0, corner_radius=0, fit_mode="cover_crop",
        background_color="#000000")
    # cover_crop leaves no background inside the panel
    assert float(sheet.min()) > 0.0 or float(sheet[0, 32, 32].sum()) > 0


def test_rounded_mask_corners():
    mask = grid._rounded_mask(16, 16, 6)
    assert mask[0, 0] == 0.0 and mask[8, 8] == 1.0
    assert mask[0, 8] == 1.0


def test_rejects_bad_inputs():
    with pytest.raises(ValueError, match="at least one"):
        grid.build_reference_sheet([])
    with pytest.raises(ValueError, match="Unknown layout"):
        grid.build_reference_sheet(_imgs(2), layout="mosaic")


def _overlap_area(r1, r2):
    x = max(0.0, min(r1[0] + r1[2], r2[0] + r2[2]) - max(r1[0], r2[0]))
    y = max(0.0, min(r1[1] + r1[3], r2[1] + r2[3]) - max(r1[1], r2[1]))
    return x * y


def test_layouts_do_not_overlap():
    for preset in ("uniform_grid", "horizontal_strip", "vertical_strip"):
        for count in (2, 4, 7):
            rects = grid.layout_rects(preset, count)
            for i in range(len(rects)):
                for j in range(i + 1, len(rects)):
                    assert _overlap_area(rects[i], rects[j]) < 1e-9


def test_aspect_rows_do_not_overlap():
    shapes = [(24, 32), (24, 48), (48, 24), (24, 24), (30, 40), (20, 60)]
    rects = grid.aspect_row_rects(shapes, 768, 448)
    for i in range(len(rects)):
        for j in range(i + 1, len(rects)):
            assert _overlap_area(rects[i], rects[j]) < 1e-9


class TestMSRReference:
    """Multi-scale-render reference batch
    (vrgdg_ltx_msr_reference_builder.py:45-148)."""

    def test_frame_count_presets_and_auto(self):
        from vrgdg_tpu.ops import msr_frame_count

        assert msr_frame_count("17 - light", 4) == 17
        assert msr_frame_count("41 - strongest", 1) == 41
        assert msr_frame_count("auto - based on subject count", 1) == 17
        assert msr_frame_count("auto", 2) == 25
        assert msr_frame_count("auto", 3) == 33
        assert msr_frame_count("auto", 4) == 41

    def test_round_robin_expansion(self):
        from vrgdg_tpu.ops.grid import expand_reference_frames

        # 17 frames over 3 images: earlier images absorb the remainder
        assert expand_reference_frames(3, 17) == [6, 6, 5]
        assert sum(expand_reference_frames(5, 41)) == 41

    def test_build_reference_batch(self):
        import numpy as np

        from vrgdg_tpu.ops import build_msr_reference

        subjects = [np.full((10, 8, 3), v, np.float32) for v in (0.2, 0.8)]
        out = build_msr_reference(subjects, background=None, width=16,
                                  height=12, reference_strength="auto")
        # 2 subjects -> 25 frames; 3 images round-robin = [9, 8, 8]
        assert out.shape == (25, 12, 16, 3)
        assert out.dtype == np.float32
        np.testing.assert_allclose(out[0], 0.2, atol=1e-5)
        np.testing.assert_allclose(out[9], 0.8, atol=1e-5)
        # trailing frames are the neutral-gray placeholder (127/255)
        np.testing.assert_allclose(out[-1], 127 / 255.0, atol=1e-5)

    def test_requires_a_subject(self):
        import pytest

        from vrgdg_tpu.ops import build_msr_reference

        with pytest.raises(ValueError):
            build_msr_reference([], background=None)
