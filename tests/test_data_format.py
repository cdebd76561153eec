from mega_nerf_viewer_tpu.n3tree import DataFormat


def test_parse_sh():
    f = DataFormat.parse("SH16")
    assert f.format == "SH"
    assert f.basis_dim == 16
    assert f.to_string() == "SH16"


def test_parse_sh_dims():
    for d in (1, 4, 9, 16, 25):
        f = DataFormat.parse(f"SH{d}")
        assert f.basis_dim == d


def test_parse_rgba_plain():
    f = DataFormat.parse("RGBA")
    assert f.format == "RGBA"
    assert f.basis_dim == -1
    assert f.to_string() == "RGBA"


def test_parse_unknown_family_with_digits():
    # reference maps any non-SH family to RGBA (src/data_format.cpp:16-19)
    f = DataFormat.parse("FOO9")
    assert f.format == "RGBA"
    assert f.basis_dim == 9


def test_hashable_static():
    # DataFormat is jit-static metadata; must be hashable and comparable
    assert hash(DataFormat.parse("SH9")) == hash(DataFormat("SH", 9))
    assert DataFormat.parse("SH9") == DataFormat("SH", 9)
