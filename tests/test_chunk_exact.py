"""Chunk-exact segment budgets + cost-balanced shard dealing
(round-5 aerial-gap work, VERDICT r4 item 2).

The ladder derivation trades budget-slot waste for a bounded jit-key
family; on record-heavy scenes the waste is 1.4-1.6x (measured 8.5 ns
per ray-slot).  ``seg_counts_from_hints`` sizes each chunk run to its
exact record max instead, and ``deal_chunks_balanced`` assigns chunks
to shards by stratified-LPT so the per-shard (= projection-worst)
march cost is balanced.  Everything must stay bit-identical to the
fraction-segment path — budgets only ever cover MORE.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mega_nerf_viewer_tpu.camera import Camera
from mega_nerf_viewer_tpu.options import RenderOptions
from mega_nerf_viewer_tpu.n3tree import sphere_tree
from mega_nerf_viewer_tpu.ops import accel
from mega_nerf_viewer_tpu.parallel.render import deal_chunks_balanced


def test_seg_counts_cover_sorted_hints():
    rng = np.random.default_rng(3)
    nrec = np.sort(rng.integers(0, 19, 5000).astype(np.int32))
    sc = accel.seg_counts_from_hints(nrec, chunk_size=64)
    # counts span all chunks (padded to whole chunks)
    n_chunks = (nrec.size + 63) // 64
    assert sum(n for n, _ in sc) == n_chunks
    # every chunk's true max fits its budget
    pad = (-nrec.size) % 64
    nh = np.concatenate([nrec, np.full(pad, nrec[-1])])
    cmax = nh.reshape(-1, 64).max(1)
    off = 0
    for n, b in sc:
        assert cmax[off:off + n].max() <= b
        off += n
    # budgets strictly increasing across runs (merged)
    buds = [b for _, b in sc]
    assert buds == sorted(set(buds))


def test_seg_counts_quantum_rounding_moves_chunks_richer():
    rng = np.random.default_rng(5)
    nrec = np.sort(rng.integers(0, 9, 64 * 21).astype(np.int32))
    sc = accel.seg_counts_from_hints(nrec, chunk_size=64, quantum=8)
    total = sum(n for n, _ in sc)
    assert total == 24                    # padded to a quantum multiple
    for n, _ in sc[:-1]:
        assert n % 8 == 0
    assert sum(n for n, _ in sc) % 8 == 0
    # coverage still holds after boundary moves
    pad = (-nrec.size) % (64 * 8)
    nh = np.concatenate([nrec, np.full(pad, nrec[-1])])
    cmax = nh.reshape(-1, 64).max(1)
    off = 0
    for n, b in sc:
        assert cmax[off:off + n].max() <= b
        off += n


def test_seg_counts_budget_cap_raises():
    with pytest.raises(ValueError):
        accel.seg_counts_from_hints(np.full(64, 200, np.int32),
                                    chunk_size=64)


def test_deal_chunks_balanced_properties():
    rng = np.random.default_rng(11)
    n_chunks, n_shards = 96, 8
    costs = rng.gamma(2.0, 10.0, n_chunks)
    costs[::7] *= 5                      # heavy tail
    sc = ((48, 0), (32, 4), (16, 8))
    slot, per_shard = deal_chunks_balanced(costs, sc, n_shards)
    assert per_shard == ((6, 0), (4, 4), (2, 8))
    # slot is a permutation of range(n_chunks)
    assert np.array_equal(np.sort(slot), np.arange(n_chunks))
    psc = n_chunks // n_shards
    shard_of = slot // psc
    # stratification: each shard gets exactly n/8 chunks of each class
    off = 0
    for n, _ in sc:
        counts = np.bincount(shard_of[off:off + n], minlength=n_shards)
        assert (counts == n // n_shards).all()
        off += n
    # within-shard slots keep ascending global chunk order per shard
    for s in range(n_shards):
        mine = np.flatnonzero(shard_of == s)
        assert (np.diff(slot[mine]) > 0).all()
    # balance never loses to the stride deal on this heavy-tailed set
    load = np.zeros(n_shards)
    np.add.at(load, shard_of, costs)
    stride_load = np.zeros(n_shards)
    np.add.at(stride_load, np.arange(n_chunks) % n_shards, costs)
    assert load.max() <= stride_load.max() + 1e-9
    # smooth costs (the measured aerial shape): near-perfect balance
    smooth = np.sort(rng.gamma(4.0, 5.0, n_chunks))
    slot2, _ = deal_chunks_balanced(smooth, sc, n_shards)
    load2 = np.zeros(n_shards)
    np.add.at(load2, slot2 // psc, smooth)
    assert load2.max() / load2.mean() < 1.05


def _cam(w=48, h=32):
    cam = Camera(w, h, 40.0)
    cam.center = np.array([-1.5, 0.1, 1.4], np.float32)
    cam._update()
    return cam


def test_chunk_exact_frame_matches_fraction_frame():
    """The seg_counts override renders value-identically to the
    fraction path within the documented shape-rounding class: a
    different segment layout changes each segment's shading-reduction
    shapes, and XLA rounds f32 reductions differently per shape
    (~1e-5; PARITY.md).  Repeat renders of the SAME layout must be
    bit-identical."""
    tree = sphere_tree(basis_dim=4, depth=4)
    lm = accel.build_leaf_map(tree)
    cam = _cam()
    opt = RenderOptions()
    cs = 64
    img0, ov0, steps, nrec, skips = accel.render_frame_fast(
        tree, lm, cam, opt, max_dense=32, chunk_size=cs,
        return_nrec=True, return_skips=True)
    assert not bool(ov0)
    order = accel.order_from_hints(steps, nrec, skips)
    ref, ovr = accel.render_frame_fast_segmented(
        tree, lm, cam, opt, order=order,
        segments=((0.5, 8), (0.5, 32)), chunk_size=cs)
    assert not np.asarray(ovr).any()
    nrec_sorted = np.asarray(nrec).reshape(-1)[np.asarray(order[0])]
    sc = accel.seg_counts_from_hints(nrec_sorted, chunk_size=cs)
    img, ov = accel.render_frame_fast_segmented(
        tree, lm, cam, opt, order=order, segments=None,
        chunk_size=cs, seg_counts=sc)
    assert not np.asarray(ov).any()
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               atol=2e-5)
    # same layout -> bit-identical repeat
    img2, _ = accel.render_frame_fast_segmented(
        tree, lm, cam, opt, order=order, segments=None,
        chunk_size=cs, seg_counts=sc)
    np.testing.assert_array_equal(np.asarray(img2), np.asarray(img))


def test_chunk_exact_sharded_bit_equals_single(eight_cpu_mesh=None):
    """Balanced-deal sharded frame == single-device chunk-exact frame
    (the deal is a pure partition)."""
    from mega_nerf_viewer_tpu.parallel.mesh import default_mesh
    from mega_nerf_viewer_tpu.parallel.render import (
        render_frame_fast_segmented_sharded)
    tree = sphere_tree(basis_dim=4, depth=4)
    lm = accel.build_leaf_map(tree)
    cam = _cam(64, 48)
    opt = RenderOptions()
    cs = 32
    img0, ov0, steps, nrec, skips = accel.render_frame_fast(
        tree, lm, cam, opt, max_dense=32, chunk_size=cs,
        return_nrec=True, return_skips=True)
    order = accel.order_from_hints(steps, nrec, skips)
    perm_h = np.asarray(order[0])
    nrec_sorted = np.asarray(nrec).reshape(-1)[perm_h]
    steps_sorted = np.asarray(steps).reshape(-1)[perm_h]
    sc = accel.seg_counts_from_hints(nrec_sorted, chunk_size=cs,
                                     quantum=8)
    R = cam.width * cam.height
    padn = sum(n for n, _ in sc) * cs - R
    stp = np.concatenate([steps_sorted, np.full(padn, steps_sorted[-1])])
    chunk_costs = stp.reshape(-1, cs).max(1)
    ref, _ = accel.render_frame_fast_segmented(
        tree, lm, cam, opt, order=order,
        segments=((0.5, 8), (0.5, 32)), chunk_size=cs)
    mesh = default_mesh()
    img, ov = render_frame_fast_segmented_sharded(
        tree, lm, cam, opt, order=order, segments=None, mesh=mesh,
        chunk_size=cs, seg_counts=sc, chunk_costs=chunk_costs)
    assert not np.asarray(ov).any()
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               atol=2e-5)
    # sorted_output roundtrip restores pixel order bit-exactly vs its
    # own unpermuted output
    rows, ov2, index_map = render_frame_fast_segmented_sharded(
        tree, lm, cam, opt, order=order, segments=None, mesh=mesh,
        chunk_size=cs, seg_counts=sc, chunk_costs=chunk_costs,
        sorted_output=True)
    back = np.asarray(rows)[np.asarray(index_map)].reshape(
        cam.height, cam.width, 4)
    np.testing.assert_array_equal(back, np.asarray(img))
