import numpy as np

from mega_nerf_viewer_tpu import RenderOptions, Camera
from mega_nerf_viewer_tpu.api import render, load_tree
from mega_nerf_viewer_tpu.n3tree import sphere_tree


def _cam():
    cam = Camera(12, 12, 16.0)
    cam.center = np.array([-1.5, 0.1, 1.4], np.float32)
    return cam


def test_render_exact_vs_fast_identical(tmp_path):
    tree = sphere_tree(basis_dim=4, depth=3)
    img_a = render(tree, _cam(), RenderOptions())
    img_b = render(tree, _cam(), RenderOptions(), fast=True)
    np.testing.assert_allclose(img_a, img_b, atol=1e-6)


def test_render_writes_png(tmp_path):
    from mega_nerf_viewer_tpu.utils import read_png
    tree = sphere_tree(basis_dim=1, depth=2)
    p = str(tmp_path / "o.png")
    img = render(tree, _cam(), RenderOptions(background_brightness=0.2),
                 out_path=p)
    assert read_png(p).shape == (12, 12, 4)
    assert img.shape == (12, 12, 4)


def test_load_tree(tmp_path):
    tree = sphere_tree(basis_dim=1, depth=2)
    p = str(tmp_path / "t.npz")
    tree.save_npz(p)
    t2 = load_tree(p, max_capacity=int(tree.capacity) + 10)
    assert t2.max_capacity == int(tree.capacity) + 10
    t3 = load_tree(p, bounds_only=True)
    assert int(t3.capacity) == 1
