"""utils: png, metrics, profiling, options parsing, cli edge cases."""

import json
import numpy as np
import pytest

from mega_nerf_viewer_tpu.utils import write_png, read_png, psnr
from mega_nerf_viewer_tpu.utils.metrics import FpsCounter, FrameTimer
from mega_nerf_viewer_tpu.utils.profiling import FrameStats
from mega_nerf_viewer_tpu.options import RenderOptions, options_from_args


def test_png_rgb_and_rgba(tmp_path, rng):
    for c in (3, 4):
        img = rng.randint(0, 256, (7, 5, c)).astype(np.uint8)
        p = str(tmp_path / f"x{c}.png")
        assert write_png(p, img)
        back = read_png(p)
        np.testing.assert_array_equal(back, img)


def test_png_rejects_bad_input(tmp_path):
    with pytest.raises(ValueError):
        write_png(str(tmp_path / "bad.png"),
                  np.zeros((4, 4, 3), np.float32))
    with pytest.raises(ValueError):
        write_png(str(tmp_path / "bad.png"), np.zeros((4, 4), np.uint8))


def test_png_spec_conformance_independent_decoder(rng):
    """The Up-filtered Huffman-only stream must decode in ANY PNG
    reader, not just our own (pins spec conformance of the fast path
    the reference picks too, ``imwrite.cpp:36-38``)."""
    Image = pytest.importorskip("PIL.Image")
    import io
    from mega_nerf_viewer_tpu.utils.png import encode_png, encode_apng

    grad = np.linspace(0, 255, 40 * 30 * 4).reshape(40, 30, 4)
    img = (grad + rng.randint(0, 8, (40, 30, 4))).astype(np.uint8)
    for lvl in (0, 1):
        blob = encode_png(img, lvl)
        got = np.asarray(Image.open(io.BytesIO(blob)))
        np.testing.assert_array_equal(got, img)
    # the filtered stream beats the stored one on smooth content
    assert len(encode_png(img, 1)) < len(encode_png(img, 0))

    frames = [img, np.roll(img, 5, axis=0), np.roll(img, 9, axis=1)]
    anim = Image.open(io.BytesIO(encode_apng(frames, fps=12)))
    assert anim.n_frames == 3
    for i, f in enumerate(frames):
        anim.seek(i)
        np.testing.assert_array_equal(np.asarray(anim.convert("RGBA")), f)


def test_png_noncontiguous_and_up_run_decode(rng):
    """Encode from a flipped view; decode streams mixing filter-0 and
    filter-2 rows (the run-segmented cumsum unfilter path)."""
    import struct
    import zlib
    from mega_nerf_viewer_tpu.utils.png import (_chunk, _ihdr, decode_png,
                                                encode_png)

    img = rng.randint(0, 256, (20, 30, 4)).astype(np.uint8)[::-1]
    np.testing.assert_array_equal(decode_png(encode_png(img)), img)

    # hand-build a stream alternating None/Up rows
    h, w, c = 6, 4, 3
    ref = rng.randint(0, 256, (h, w, c)).astype(np.uint8)
    lines = []
    for r in range(h):
        if r % 3 == 0:
            lines.append(b"\x00" + ref[r].tobytes())
        else:
            lines.append(b"\x02" + (ref[r] - ref[r - 1]).tobytes())
    blob = b"".join([b"\x89PNG\r\n\x1a\n", _ihdr(w, h, c),
                     _chunk(b"IDAT", zlib.compress(b"".join(lines))),
                     _chunk(b"IEND", b"")])
    np.testing.assert_array_equal(decode_png(blob), ref)


def test_psnr():
    a = np.zeros((8, 8))
    assert psnr(a, a) == float("inf")
    b = a + 0.1
    assert abs(psnr(a, b) - 20.0) < 1e-6


def test_fps_counter():
    f = FpsCounter(window=10.0)
    assert f.fps == 0.0
    for _ in range(5):
        f.tick()
    assert f.fps > 0


def test_frame_timer():
    t = FrameTimer()
    with t.time("x"):
        pass
    assert t.mean_ms("x") >= 0
    assert t.mean_ms("missing") == 0.0


def test_frame_stats(tmp_path):
    p = str(tmp_path / "stats.jsonl")
    s = FrameStats(sink=p)
    s.record(100, 50, 0.02, extra_field=7)
    s.record(100, 50, 0.04)
    summary = s.summary()
    assert summary["frames"] == 2
    assert 20.0 <= summary["p50_ms"] <= 40.0
    lines = [json.loads(l) for l in open(p)]
    assert lines[0]["extra_field"] == 7
    assert abs(lines[0]["rays_per_sec"] - 100 * 50 / 0.02) < 1


def test_options_from_args():
    from mega_nerf_viewer_tpu.cli import build_parser
    args = build_parser().parse_args(
        ["t.npz", "--bg", "0.5", "-s", "1e-3", "-e", "0.05", "-a", "0.2",
         "-x", "77", "-n", "99", "-v", "3", "-y", "2", "-z", "64",
         "--grid", "3"])
    opts = options_from_args(args)
    assert opts.background_brightness == 0.5
    assert opts.step_size == 1e-3
    assert opts.stop_thresh == 0.05
    assert opts.sigma_thresh == 0.2
    assert opts.split_batch_size == 77
    assert opts.nerf_batch_size == 99
    assert opts.samples_per_corner == 3
    assert opts.appearance_embedding == 2
    assert opts.max_guided_samples == 64
    assert opts.show_grid and opts.grid_max_depth == 3


def test_cli_missing_file_friendly(capsys):
    from mega_nerf_viewer_tpu.cli import main
    rc = main(["/definitely/not/here.npz"])
    assert rc == 1
    err = capsys.readouterr().err
    assert "does not exist" in err


def test_cli_save_tree_roundtrip(tmp_path):
    from mega_nerf_viewer_tpu.cli import main
    from mega_nerf_viewer_tpu.n3tree import sphere_tree, N3Tree
    t = sphere_tree(basis_dim=1, depth=2)
    src = str(tmp_path / "in.npz")
    t.save_npz(src)
    out_tree = str(tmp_path / "out.npz")
    rc = main([src, "-w", "8", "--height", "8", "--fx", "10",
               "-o", str(tmp_path / "f.png"), "--save_tree", out_tree])
    assert rc == 0
    t2 = N3Tree.open(out_tree)
    assert int(t2.capacity) == int(t.capacity)


def test_cli_render_depth_and_bounds_only(tmp_path):
    from mega_nerf_viewer_tpu.cli import main
    from mega_nerf_viewer_tpu.n3tree import sphere_tree
    from mega_nerf_viewer_tpu.utils import read_png
    t = sphere_tree(basis_dim=1, depth=3)
    src = str(tmp_path / "in.npz")
    t.save_npz(src)
    out = str(tmp_path / "d.png")
    rc = main([src, "-w", "8", "--height", "8", "--fx", "10",
               "--render_depth", "-b", "-o", out])
    assert rc == 0
    img = read_png(out)
    assert img.shape == (8, 8, 4)


def test_apng_roundtrip(tmp_path, rng):
    from mega_nerf_viewer_tpu.utils.png import (write_apng, decode_apng,
                                                encode_apng)
    frames = [(rng.rand(6, 5, 4) * 255).astype(np.uint8)
              for _ in range(4)]
    path = str(tmp_path / "a.apng")
    assert write_apng(path, frames, fps=20.0, loops=2)
    back, fps, loops = decode_apng(open(path, "rb").read())
    assert len(back) == 4 and fps == pytest.approx(20.0) and loops == 2
    for a, b in zip(frames, back):
        assert (a == b).all()
    # the default image (plain-PNG view) is frame 0
    from mega_nerf_viewer_tpu.utils.png import decode_png
    assert (decode_png(encode_apng(frames)) == frames[0]).all()
    # RGB frames work too
    rgb = [f[..., :3].copy() for f in frames]
    back, _, _ = decode_apng(encode_apng(rgb))
    assert back[0].shape == (6, 5, 3)


def test_apng_rejects_bad_input():
    from mega_nerf_viewer_tpu.utils.png import encode_apng
    with pytest.raises(ValueError):
        encode_apng([])
    with pytest.raises(ValueError):
        encode_apng([np.zeros((4, 4, 4), np.uint8),
                     np.zeros((4, 5, 4), np.uint8)])
    with pytest.raises(ValueError):
        encode_apng([np.zeros((4, 4, 4), np.float32)])
    # a REJECTED first frame must not poison the shape check: the
    # encoder stays usable and takes any valid shape afterwards
    from mega_nerf_viewer_tpu.utils.png import ApngEncoder
    enc = ApngEncoder()
    with pytest.raises(ValueError):
        enc.add(np.zeros((4, 4, 4), np.float32))
    enc.add(np.zeros((8, 8, 4), np.uint8))
    assert enc.tobytes().startswith(b"\x89PNG")


def test_cli_orbit_apng(tmp_path):
    from mega_nerf_viewer_tpu.cli import main
    from mega_nerf_viewer_tpu.n3tree import sphere_tree
    from mega_nerf_viewer_tpu.utils.png import decode_apng
    t = sphere_tree(basis_dim=1, depth=2)
    src = str(tmp_path / "in.npz")
    t.save_npz(src)
    out = str(tmp_path / "orbit.apng")
    rc = main([src, "-w", "8", "--height", "8", "--fx", "10",
               "--frames", "3", "--orbit", "--fps", "12", "-o", out])
    assert rc == 0
    frames, fps, loops = decode_apng(open(out, "rb").read())
    assert len(frames) == 3 and loops == 0
    assert fps == pytest.approx(12.0, rel=0.05)
    assert frames[0].shape == (8, 8, 4)
    # the orbit actually moved the camera between frames
    assert any((frames[0] != f).any() for f in frames[1:])
