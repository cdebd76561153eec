import numpy as np

import jax
import jax.numpy as jnp

from mega_nerf_viewer_tpu.camera import Camera
from mega_nerf_viewer_tpu.options import RenderOptions
from mega_nerf_viewer_tpu.n3tree import sphere_tree, random_tree, N3Tree
from mega_nerf_viewer_tpu.models import MegaNeRFModel
from mega_nerf_viewer_tpu.ops import refine, oracle
from mega_nerf_viewer_tpu.ops.render import render_rays
from mega_nerf_viewer_tpu.ops.rays import screen2worlddir, rodrigues


def _rays(cam, opt):
    dirs, cen = screen2worlddir(cam.width, cam.height, cam.fx, cam.fy,
                                cam.cx, cam.cy, jnp.asarray(cam.transform))
    vdirs = rodrigues(jnp.asarray(opt.rot_dirs, jnp.float32), dirs)
    return dirs, vdirs, cen


def _check_tree_invariants(tree):
    cap = int(tree.capacity)
    child = np.asarray(tree.child)[:cap]
    parent = np.asarray(tree.parent)[:cap]
    n3 = tree.N3
    for c in range(cap):
        for ci in range(n3):
            off = child[c, ci]
            assert off >= 0, f"negative child offset at {c},{ci}"
            if off > 0:
                tgt = c + off
                assert tgt < cap, f"dangling child {c},{ci} -> {tgt}"
                assert parent[tgt] == c * n3 + ci, \
                    f"parent mismatch at {tgt}"


def test_aggregate_split_votes_ordering():
    # votes: [priority, chunk, child]; counts rule: keep > 1, most first
    votes = np.array([
        [2, 5, 1], [2, 5, 1], [2, 5, 1],     # count 3
        [1, 3, 0], [1, 3, 0],                # count 2, shallower priority
        [2, 7, 2], [2, 7, 2],                # count 2
        [4, 9, 3],                           # count 1 -> dropped
        [9, -1, -1],                         # invalid
    ], np.float32)
    out = refine.aggregate_split_votes(votes, 10)
    np.testing.assert_array_equal(out[0], [5, 1])     # highest count
    np.testing.assert_array_equal(out[1], [3, 0])     # then priority asc
    np.testing.assert_array_equal(out[2], [7, 2])
    assert len(out) == 3
    out2 = refine.aggregate_split_votes(votes, 2)
    assert len(out2) == 2


def test_aggregate_sample_votes_ordering():
    votes = np.array([
        [8, 2, 1],
        [3, 4, 0],     # lowest sample count first
        [5, 1, 7],
        [300, -1, -1],
    ], np.float32)
    out = refine.aggregate_sample_votes(votes, 10)
    np.testing.assert_array_equal(out[0], [4, 0])
    np.testing.assert_array_equal(out[1], [1, 7])
    np.testing.assert_array_equal(out[2], [2, 1])


def test_node_corners_matches_topology():
    tree = sphere_tree(basis_dim=1, depth=3)
    cap = int(tree.capacity)
    child = np.asarray(tree.child)[:cap]
    # find a leaf: descend manually from root
    corner, depth = refine.node_corners(
        tree.parent, jnp.asarray([0], jnp.int32), jnp.asarray([0], jnp.int32),
        tree.N)
    np.testing.assert_allclose(np.asarray(corner)[0], [0, 0, 0], atol=1e-6)
    assert int(depth[0]) == 0
    # child chunk of root slot s (if any)
    for s in range(8):
        if child[0, s] > 0:
            c = child[0, s]
            corner, depth = refine.node_corners(
                tree.parent, jnp.asarray([c], jnp.int32),
                jnp.asarray([0], jnp.int32), tree.N)
            i, j, k = s // 4, (s // 2) % 2, s % 2
            np.testing.assert_allclose(
                np.asarray(corner)[0], np.array([i, j, k]) / 2.0, atol=1e-6)
            assert int(depth[0]) == 1
            break


def test_expand_voxels_structure():
    tree = sphere_tree(basis_dim=1, depth=3, max_capacity=5000)
    model = MegaNeRFModel.synthetic(data_dim=4, n_clusters=4, seed=0)
    opt = RenderOptions(use_splitting=True, split_batch_size=64)
    cam = Camera(24, 24, 30.0)
    cam.center = np.array([-1.5, 0.1, 1.4], np.float32)
    cam._update()
    dirs, vdirs, cen = _rays(cam, opt)
    res = render_rays(tree, dirs, vdirs, cen, opt)
    tracker = jnp.zeros((tree.max_capacity,), jnp.int32).at[0].set(1)
    cap0 = int(tree.capacity)
    new_tree, tracker, added = refine.expand_voxels(
        tree, model, opt, res.split_vote, tracker,
        key=jax.random.PRNGKey(0))
    assert added > 0
    assert int(new_tree.capacity) == cap0 + added
    _check_tree_invariants(new_tree)
    # new chunks must have sample_counts == samples_per_corner
    sc = np.asarray(new_tree.sample_counts)[cap0:cap0 + added]
    assert np.all(sc == opt.samples_per_corner)
    # renderer still agrees with oracle on the refined tree
    host = oracle.tree_to_host(new_tree)
    res2 = render_rays(new_tree, dirs, vdirs, cen, opt)
    got = np.asarray(res2.out)
    d_np, v_np, c_np = map(np.asarray, (dirs, vdirs, cen))
    errs = []
    for i in range(0, len(d_np), 7):
        want, _, _, _ = oracle.trace_ray(host, d_np[i], v_np[i], c_np, opt)
        errs.append(np.abs(got[i] - want).max())
    assert np.mean(np.asarray(errs) < 2e-5) >= 0.99


def test_expand_full_tree_aborts():
    tree = sphere_tree(basis_dim=1, depth=3)   # max_capacity == capacity
    model = MegaNeRFModel.synthetic(data_dim=4, n_clusters=4)
    opt = RenderOptions(split_batch_size=64)
    votes = np.array([[1, 0, 0]] * 3, np.float32)
    tracker = jnp.zeros((tree.max_capacity,), jnp.int32)
    new_tree, _, added = refine.expand_voxels(tree, model, opt, votes,
                                              tracker)
    assert added == 0
    assert int(new_tree.capacity) == int(tree.capacity)


def test_get_more_samples_incremental_mean():
    tree = sphere_tree(basis_dim=1, depth=2, max_capacity=100)

    class ConstModel:
        grid_dim = np.array([1, 1], np.int32)
        min_position = np.array([-1, -1, -1], np.float32)
        max_position = np.array([1, 1, 1], np.float32)
        range = max_position - min_position
        output_dim = 5

        def cluster_ids_for_points(self, yz):
            return np.zeros(yz.shape[:-1], np.int16)

        def cluster_ids_device(self, yz):
            return jnp.zeros(yz.shape[:-1], jnp.int32)

        def query(self, ids, samples, *a, **k):
            return jnp.full((samples.shape[0], 5), 2.0, jnp.float32)

        def query_device(self, ids, samples):
            return jnp.full((samples.shape[0], 5), 2.0, jnp.float32)

    opt = RenderOptions(samples_per_corner=8, split_batch_size=16)
    votes = np.array([[8, 0, 3]], np.float32)   # resample chunk 0, child 3
    old = np.asarray(tree.data)[0, 3].astype(np.float32)
    old_n = int(np.asarray(tree.sample_counts)[0, 3])
    new_tree = refine.get_more_samples(tree, ConstModel(), opt, votes,
                                       key=jax.random.PRNGKey(1))
    got = np.asarray(new_tree.data)[0, 3].astype(np.float32)
    spc = opt.samples_per_corner
    want = old + (spc * 2.0 - spc * old) / (old_n + spc)
    np.testing.assert_allclose(got, want, atol=2e-2)  # f16 storage
    assert int(np.asarray(new_tree.sample_counts)[0, 3]) == old_n + spc
    # untouched node unchanged
    np.testing.assert_array_equal(np.asarray(new_tree.data)[0, 1],
                                  np.asarray(tree.data)[0, 1])


def test_prune_preserves_visible_render():
    tree = sphere_tree(basis_dim=1, depth=4, max_capacity=None)
    opt = RenderOptions()
    cam = Camera(20, 20, 26.0)
    cam.center = np.array([-1.5, 0.1, 1.4], np.float32)
    cam._update()
    dirs, vdirs, cen = _rays(cam, opt)
    res = render_rays(tree, dirs, vdirs, cen, opt, track_visit=True)
    img_before = np.asarray(res.out)
    tracker = jnp.maximum(
        jnp.zeros((tree.max_capacity,), jnp.int32).at[0].set(1),
        res.visited)
    new_tree, new_tracker = refine.prune_tree(tree, tracker)
    n_kept = int(new_tree.capacity)
    assert n_kept < int(tree.capacity)
    _check_tree_invariants(new_tree)
    res2 = render_rays(new_tree, dirs, vdirs, cen, opt)
    img_after = np.asarray(res2.out)
    np.testing.assert_allclose(img_after, img_before, atol=1e-6)
    # tracker reset with root marked
    assert int(new_tracker[0]) == 1
    assert int(jnp.sum(new_tracker)) == 1


def test_prune_nothing_to_prune():
    tree = sphere_tree(basis_dim=1, depth=2)
    tracker = jnp.ones((tree.max_capacity,), jnp.int32)
    new_tree, new_tracker = refine.prune_tree(tree, tracker)
    assert int(new_tree.capacity) == int(tree.capacity)
    np.testing.assert_array_equal(np.asarray(new_tree.child),
                                  np.asarray(tree.child))


def test_expand_jit_topology_matches_host():
    """Host and jitted expand produce identical topology from the same
    votes (data differs only via RNG shapes)."""
    tree = sphere_tree(basis_dim=1, depth=3, max_capacity=5000)
    model = MegaNeRFModel.synthetic(
        data_dim=4, n_clusters=4, grid_dim=(2, 2),
        min_position=(-2, -2, -2), max_position=(2, 2, 2))
    opt = RenderOptions(use_splitting=True, split_batch_size=32)
    cam = Camera(20, 20, 26.0)
    cam.center = np.array([-1.5, 0.1, 1.4], np.float32)
    cam._update()
    dirs, vdirs, cen = _rays(cam, opt)
    res = render_rays(tree, dirs, vdirs, cen, opt)
    tracker = jnp.zeros((tree.max_capacity,), jnp.int32).at[0].set(1)

    t_host, tr_h, n_host = refine.expand_voxels(
        tree, model, opt, res.split_vote, tracker,
        key=jax.random.PRNGKey(7))
    t_jit, tr_j, n_jit = refine.expand_voxels_jit(
        tree, model.params,
        jnp.asarray(model.grid_dim, jnp.int32),
        jnp.asarray(model.min_position, jnp.float32),
        jnp.asarray(model.range, jnp.float32),
        opt, res.split_vote, tracker, jax.random.PRNGKey(7))
    assert n_host == int(n_jit) > 0
    cap = int(t_host.capacity)
    assert int(t_jit.capacity) == cap
    np.testing.assert_array_equal(np.asarray(t_host.child)[:cap],
                                  np.asarray(t_jit.child)[:cap])
    np.testing.assert_array_equal(np.asarray(t_host.parent)[:cap],
                                  np.asarray(t_jit.parent)[:cap])
    np.testing.assert_array_equal(
        np.asarray(t_host.sample_counts)[:cap],
        np.asarray(t_jit.sample_counts)[:cap])
    _check_tree_invariants(t_jit)


def test_device_vote_aggregation_not_biased_to_low_ids():
    """Device top-K must select by vote count, not by node id
    (regression: jnp.unique(size=K+1) kept the K+1 smallest ids)."""
    import jax.numpy as jnp
    from mega_nerf_viewer_tpu.ops.refine import (
        aggregate_split_votes_device)
    N3 = 8
    K = 2
    # many low-id nodes with 2 votes each, one HIGH-id node with 6 votes
    rows = []
    for chunk in range(1, 7):           # nodes 8..48, 2 votes each
        rows += [[3.0, float(chunk), 0.0]] * 2
    rows += [[3.0, 90.0, 5.0]] * 6      # node 725, 6 votes
    votes = jnp.asarray(rows, jnp.float32)
    nodes, _, valid = aggregate_split_votes_device(votes, N3, K)
    got = set(int(n) for n, ok in zip(np.asarray(nodes),
                                      np.asarray(valid)) if ok)
    assert 90 * N3 + 5 in got


def test_device_vote_aggregation_matches_host_randomized():
    """Randomized host-vs-device equivalence for the sort+run-length
    aggregation (which replaced jnp.unique + searchsorted — the latter
    cost ~347 ms at frame scale on v5e).  Depth is a function of the
    node (as in real vote frames), so host row-unique == node-unique."""
    import jax.numpy as jnp
    from mega_nerf_viewer_tpu.ops.refine import (
        aggregate_split_votes, aggregate_split_votes_device)
    rng = np.random.RandomState(7)
    N3 = 8
    for K in (4, 300):
        R = 600
        chunks = rng.randint(0, 25, R)
        cidx = rng.randint(0, N3, R)
        depth = ((chunks * N3 + cidx) % 5 + 1).astype(np.float32)
        votes = np.stack([depth, chunks, cidx], 1).astype(np.float32)
        votes[rng.rand(R) < 0.3, 1:] = -1          # non-voting rays
        host = aggregate_split_votes(votes, K)
        nodes, _, valid = aggregate_split_votes_device(
            jnp.asarray(votes), N3, K)
        nodes = np.asarray(nodes)[np.asarray(valid)]
        got = np.stack([nodes // N3, nodes % N3], axis=1)
        np.testing.assert_array_equal(got, host)
