"""Viewer session checkpoint/resume."""

import numpy as np

from mega_nerf_viewer_tpu import Viewer, RenderOptions, Camera
from mega_nerf_viewer_tpu.n3tree import sphere_tree


def test_save_load_state(tmp_path):
    tree = sphere_tree(basis_dim=1, depth=3)
    cam = Camera(20, 16, 25.0)
    cam.center = np.array([-1.0, 0.5, 2.0], np.float32)
    cam._update()
    v = Viewer(tree, camera=cam,
               options=RenderOptions(sigma_thresh=0.05, show_grid=True,
                                     grid_max_depth=3))
    state_p = str(tmp_path / "session.json")
    tree_p = str(tmp_path / "session_tree.npz")
    v.save_state(state_p, tree_path=tree_p)

    v2 = Viewer()
    v2.load_state(state_p)
    assert v2.camera.width == 20 and v2.camera.height == 16
    np.testing.assert_allclose(v2.camera.center, cam.center)
    assert v2.options.sigma_thresh == 0.05
    assert v2.options.show_grid and v2.options.grid_max_depth == 3
    assert int(v2.tree.capacity) == int(tree.capacity)
    # resumed session renders identically
    img1 = v.render()
    img2 = v2.render()
    np.testing.assert_allclose(img1, img2, atol=1e-6)


def test_sample_counts_roundtrip(tmp_path):
    """save_npz writes sample_counts and open() reads them back, so
    resumed refinement keeps incremental-mean weights (regression:
    counts were silently reset to 8 on load)."""
    import jax.numpy as jnp
    from mega_nerf_viewer_tpu.n3tree import N3Tree
    tree = sphere_tree(basis_dim=1, depth=2)
    counts = np.asarray(tree.sample_counts).copy()
    counts[0, :] = 41
    tree = N3Tree(
        data=tree.data, child=tree.child, parent=tree.parent,
        sample_counts=jnp.asarray(counts), scale=tree.scale,
        offset=tree.offset, capacity=tree.capacity, N=tree.N,
        data_dim=tree.data_dim, data_format=tree.data_format)
    p = str(tmp_path / "t.npz")
    tree.save_npz(p)
    t2 = N3Tree.open(p)
    assert int(np.asarray(t2.sample_counts)[0, 0]) == 41


def test_mid_refinement_checkpoint_resume(tmp_path):
    """Checkpoint DURING a refinement session: the refined topology,
    sample counts, and every option knob survive the round trip, and
    the resumed session continues refining from where it left off
    (the reference has no state persistence at all — SURVEY §5 names
    this a new capability; refined trees there die with the process)."""
    from mega_nerf_viewer_tpu.models import MegaNeRFModel
    tree = sphere_tree(basis_dim=1, depth=3)
    v = Viewer(tree, max_tree_capacity=4000)
    v.model = MegaNeRFModel.synthetic(data_dim=4)
    v.options = v.options.replace(use_splitting=True,
                                  split_batch_size=16,
                                  samples_per_corner=4,
                                  sigma_thresh=0.02)
    cap0 = int(v.tree.capacity)
    v.render()
    cap1 = int(v.tree.capacity)
    assert cap1 > cap0, "refinement did not split"

    state_p = str(tmp_path / "mid.json")
    tree_p = str(tmp_path / "mid_tree.npz")
    v.save_state(state_p, tree_path=tree_p)

    v2 = Viewer(max_tree_capacity=4000)
    v2.load_state(state_p)
    v2.model = v.model
    assert v2.options == v.options          # every field round-trips
    assert int(v2.tree.capacity) == cap1
    np.testing.assert_array_equal(
        np.asarray(v2.tree.sample_counts[:cap1]),
        np.asarray(v.tree.sample_counts[:cap1]))
    np.testing.assert_array_equal(np.asarray(v2.tree.child[:cap1]),
                                  np.asarray(v.tree.child[:cap1]))
    # resumed session keeps refining
    v2.render()
    assert int(v2.tree.capacity) >= cap1


def test_load_state_without_tree(tmp_path):
    """load_tree=False restores camera/options onto the existing tree;
    a state file with no tree_path leaves the tree untouched."""
    tree = sphere_tree(basis_dim=1, depth=2)
    v = Viewer(tree)
    v.options = v.options.replace(render_depth=True)
    p = str(tmp_path / "s.json")
    v.save_state(p)                      # no tree_path recorded
    other = sphere_tree(basis_dim=1, depth=3)
    v2 = Viewer(other)
    v2.load_state(p)
    assert v2.options.render_depth
    assert int(v2.tree.capacity) == int(other.capacity)
    v2.load_state(p, load_tree=False)
    assert int(v2.tree.capacity) == int(other.capacity)


def test_save_npz_writes_depth_column(tmp_path):
    """svox stores per-chunk depth in parent_depth[:, 1]; a re-saved
    tree must carry real depths (reconstructed from the parent chain),
    not zeros — external svox consumers read them."""
    tree = sphere_tree(basis_dim=1, depth=4)
    p = tmp_path / "t.npz"
    tree.save_npz(str(p))
    raw = np.load(str(p))
    pd = raw["parent_depth"]
    cap = pd.shape[0]
    assert pd[0, 1] == 0
    assert pd[:, 1].max() >= 2          # a depth-4 tree has deep chunks
    pc = np.clip(pd[:, 0] // tree.N3, 0, cap - 1)
    assert np.array_equal(pd[1:, 1], pd[pc[1:], 1] + 1)
