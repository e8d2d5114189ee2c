import numpy as np
import pytest

from vrgdg_tpu.core import cube


def test_parse_write_roundtrip(tmp_path):
    lut = cube.build_palette_lut("#0b1d51, #1f6aa5, #f3d27a", 17)
    path = tmp_path / "test.cube"
    cube.write_cube(lut, str(path), title="roundtrip")
    parsed = cube.parse_cube(str(path))
    assert parsed.size == 17
    assert parsed.title == "roundtrip"
    np.testing.assert_allclose(parsed.table, lut.table, atol=1e-6)
    np.testing.assert_allclose(parsed.domain_min, [0, 0, 0])
    np.testing.assert_allclose(parsed.domain_max, [1, 1, 1])


def test_parse_rejects_1d(tmp_path):
    path = tmp_path / "bad.cube"
    path.write_text("LUT_1D_SIZE 16\n0 0 0\n")
    with pytest.raises(cube.CubeParseError, match="1D"):
        cube.parse_cube(str(path))


def test_parse_rejects_wrong_count(tmp_path):
    path = tmp_path / "short.cube"
    path.write_text("LUT_3D_SIZE 2\n" + "0 0 0\n" * 7)
    with pytest.raises(cube.CubeParseError, match="Expected|expected"):
        cube.parse_cube(str(path))


def test_parse_missing_size(tmp_path):
    path = tmp_path / "nosize.cube"
    path.write_text("0 0 0\n" * 8)
    with pytest.raises(cube.CubeParseError, match="LUT_3D_SIZE"):
        cube.parse_cube(str(path))


def test_parse_domain_and_comments(tmp_path):
    lines = ["# comment", 'TITLE "t"', "LUT_3D_SIZE 2",
             "DOMAIN_MIN 0.1 0.1 0.1", "DOMAIN_MAX 0.9 0.9 0.9"]
    lines += ["%f %f %f" % (i / 7, i / 7, i / 7) for i in range(8)]
    path = tmp_path / "dom.cube"
    path.write_text("\n".join(lines))
    parsed = cube.parse_cube(str(path))
    np.testing.assert_allclose(parsed.domain_min, [0.1] * 3, atol=1e-6)
    np.testing.assert_allclose(parsed.domain_max, [0.9] * 3, atol=1e-6)


def test_identity_lattice_order():
    lut = cube.identity_lut(5)
    # table[b, g, r] == (r, g, b)/(N-1): red varies along the last lattice axis
    np.testing.assert_allclose(lut.table[0, 0, 4], [1.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(lut.table[4, 0, 0], [0.0, 0.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(lut.table[0, 4, 0], [0.0, 1.0, 0.0], atol=1e-6)


def test_palette_lut_matches_reference_math():
    """Re-derive the palette math inline and compare (pins the 0.82/0.18
    chroma reinjection and luma rescale from VRGDG_IV_Adjustments.py:90-105)."""
    colors = "#ff0000, #00ff00"
    size = 9
    lut = cube.build_palette_lut(colors, size)
    palette = np.stack([[1, 0, 0], [0, 1, 0]]).astype(np.float32)
    axis = np.linspace(0, 1, size, dtype=np.float32)
    b, g, r = np.meshgrid(axis, axis, axis, indexing="ij")
    source = np.stack([r, g, b], axis=-1)
    luma = 0.2126 * r + 0.7152 * g + 0.0722 * b
    stops = np.linspace(0, 1, 2, dtype=np.float32)
    target = np.stack([np.interp(luma.ravel(), stops, palette[:, c])
                       for c in range(3)], -1).reshape(luma.shape + (3,))
    tl = 0.2126 * target[..., 0] + 0.7152 * target[..., 1] + 0.0722 * target[..., 2]
    target = np.clip(target * (luma / np.maximum(tl, 1e-6))[..., None], 0, 1)
    chroma = source - luma[..., None]
    expected = np.clip(target * 0.82 + (target + chroma) * 0.18, 0, 1)
    np.testing.assert_allclose(lut.table, expected.astype(np.float32), atol=1e-5)


def test_hex_parsing():
    np.testing.assert_allclose(cube.parse_hex_color("#ff8800"),
                               [1.0, 136 / 255, 0.0], atol=1e-6)
    np.testing.assert_allclose(cube.parse_hex_color("f80"),
                               [1.0, 136 / 255, 0.0], atol=1e-6)
    np.testing.assert_allclose(cube.parse_hex_color("white"), [1, 1, 1])
    with pytest.raises(ValueError):
        cube.parse_hex_color("notacolor")
    with pytest.raises(ValueError):
        cube.parse_color_list("")


def test_cache(tmp_path):
    path = str(tmp_path / "c.cube")
    cube.write_cube(cube.identity_lut(4), path)
    cache = cube.LutCache()
    first = cache.load(path)
    assert cache.load(path) is first  # cache hit
    import os
    import time
    time.sleep(0.01)
    cube.write_cube(cube.identity_lut(5), path)
    os.utime(path, (time.time() + 5, time.time() + 5))
    assert cache.load(path).size == 5  # mtime invalidation


def test_list_lut_files(tmp_path):
    (tmp_path / "b.cube").write_text("x")
    (tmp_path / "A.cube").write_text("x")
    (tmp_path / "note.txt").write_text("x")
    assert cube.list_lut_files(str(tmp_path)) == ["A.cube", "b.cube"]
    assert cube.list_lut_files(str(tmp_path / "missing")) == []


def test_parse_cube_fuzz_malformed(tmp_path):
    """Malformed .cube inputs must raise CubeParseError (or parse), never
    crash with an unrelated exception."""
    from vrgdg_tpu.core.cube import CubeParseError, parse_cube

    cases = [
        "",                                     # empty
        "LUT_3D_SIZE\n",                        # missing value
        "LUT_3D_SIZE 2\n0 0 0\n",               # wrong count
        "LUT_1D_SIZE 4\n",                      # 1D rejected
        "TITLE \"x\"\n0 0 0\n",                 # no size
        "LUT_3D_SIZE 2\n" + "0 0 0\n" * 9,      # too many
        "LUT_3D_SIZE abc\n",                    # non-numeric size
        "DOMAIN_MIN 0 0\nLUT_3D_SIZE 2\n" + "0 0 0\n" * 8,  # bad domain
        "LUT_3D_SIZE 2\n" + "x y z\n" * 8,      # non-numeric rows
    ]
    for index, text in enumerate(cases):
        path = tmp_path / f"fuzz_{index}.cube"
        path.write_text(text)
        try:
            parse_cube(str(path))
        except (CubeParseError, ValueError):
            pass  # expected failure mode


def test_parse_cube_tolerates_junk_metadata(tmp_path):
    """Unknown metadata lines are skipped like the reference parser."""
    from vrgdg_tpu.core.cube import parse_cube

    text = ("# comment\nTITLE \"t\"\nLUT_3D_SIZE 2\n"
            "SOME_FUTURE_KEY hello world\n" + "0.5 0.5 0.5\n" * 8)
    path = tmp_path / "meta.cube"
    path.write_text(text)
    lut = parse_cube(str(path))
    assert lut.size == 2 and lut.title == "t"
