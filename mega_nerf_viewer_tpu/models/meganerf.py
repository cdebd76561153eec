"""Mega-NeRF MLP container: JAX inference + TorchScript weight conversion.

TPU-native replacement for the reference's LibTorch model layer
(``src/renderer/cuda_renderer.cpp:518-543`` load_model,
``:165-203`` query_submodules).  The reference keeps a TorchScript module
per spatial cluster and executes it through the TorchScript interpreter;
here the submodules are converted once to stacked JAX weight arrays
(one leading cluster axis) and inference is jitted batched matmuls on the
MXU in bf16-safe f32 accumulation.

Container contract (reference ``cuda_renderer.cpp:518-543``):
  * attrs ``grid_dim`` (int[2]), ``min_position`` / ``max_position``
    (float[3]), ``centroids`` (count == number of submodules),
    ``need_viewdir`` (bool), ``need_appearance_embedding`` (bool)
  * submodules ``sub_module_<i>``: input ``[n, 3(+3)(+1)]`` =
    [xyz, (viewdir), (appearance)], second arg ``False``; output
    ``[n, data_dim + 1]`` (SH coeffs + sigma + 1 extra, discarded by the
    caller's ``slice(2, 0, data_dim)``).

Cluster id for a point is a 2-D cell over (y, z):
``g1 * grid_dim[1] + g2`` (reference ``rt_core.cuh:541-549``).

Conversion strategy: submodule Linear weights are replayed as a
sequential MLP; skip-concats of the raw input are inferred from weight
shapes.  The conversion is *verified* against the TorchScript forward on
random inputs at load; if the graph doesn't match this family, the model
transparently falls back to eager torch execution (CPU) so arbitrary
containers still work — only at reduced speed.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MLPParams:
    """Stacked per-cluster MLP weights.

    ``weights[l]: f32[n_clusters, in_l, out_l]``, ``biases[l]:
    f32[n_clusters, out_l]``.  ``skips`` marks layers whose input is
    ``concat([h, x0])`` (NeRF-style skip reinjection).
    """
    weights: List[jax.Array]
    biases: List[jax.Array]
    skips: Tuple[int, ...] = dataclasses.field(
        metadata=dict(static=True), default=())

    @property
    def n_clusters(self) -> int:
        return self.weights[0].shape[0]

    @property
    def input_dim(self) -> int:
        return self.weights[0].shape[1]

    @property
    def output_dim(self) -> int:
        return self.weights[-1].shape[2]


def mlp_forward(params: MLPParams, cluster: jax.Array,
                x: jax.Array) -> jax.Array:
    """Forward ``x [n, in]`` through the MLP of one ``cluster`` (scalar)."""
    h = x
    n_layers = len(params.weights)
    for l in range(n_layers):
        if l in params.skips:
            h = jnp.concatenate([h, x], axis=-1)
        w = params.weights[l][cluster]
        b = params.biases[l][cluster]
        h = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        if l < n_layers - 1:
            h = jax.nn.relu(h)
    return h


def mlp_forward_grouped(params: MLPParams, sorted_x: jax.Array,
                        group_sizes: jax.Array) -> jax.Array:
    """Grouped-matmul MLP over cluster-sorted samples.

    The TPU-native replacement for the reference's per-cluster chunk
    loop (``query_submodules``, cuda_renderer.cpp:165-203): one
    ``lax.ragged_dot`` per layer runs every cluster's weights over its
    contiguous sample segment on the MXU — O(1) dispatches regardless
    of cluster count or sample count.  Biases are folded into the
    matmul via a ones-column augmentation (per-row bias gathers are
    ~10 ns/row on v5e; a k+1 matmul row is free).

    Args:
      sorted_x: f32 [n, in_dim], samples sorted by cluster id.
      group_sizes: i32 [n_clusters], samples per cluster (sum == n).
    Returns f32 [n, out_dim] in the sorted order.
    """
    h = sorted_x
    x0 = sorted_x
    n_layers = len(params.weights)
    for l in range(n_layers):
        if l in params.skips:
            h = jnp.concatenate([h, x0], axis=-1)
        w = params.weights[l]                       # [C, in, out]
        b = params.biases[l]                        # [C, out]
        w_aug = jnp.concatenate([w, b[:, None, :]], axis=1)
        h_aug = jnp.concatenate(
            [h, jnp.ones((h.shape[0], 1), h.dtype)], axis=-1)
        h = jax.lax.ragged_dot(h_aug, w_aug, group_sizes,
                               preferred_element_type=jnp.float32)
        if l < n_layers - 1:
            h = jax.nn.relu(h)
    return h


@jax.jit
def _query_grouped(params: MLPParams, cluster_ids: jax.Array,
                   x: jax.Array) -> jax.Array:
    """Sort-once grouped dispatch: samples in ANY order -> outputs in
    the same order.  One stable sort by cluster id, grouped matmuls,
    inverse-permutation gather back.  (ragged_dot reference path; the
    production dispatcher is :func:`query_grouped` — see
    :func:`mlp_forward_chunked` for why.)"""
    C = params.n_clusters
    ids = jnp.clip(cluster_ids.astype(jnp.int32), 0, C - 1)
    perm = jnp.argsort(ids, stable=True)
    inv = jnp.argsort(perm, stable=True)
    # unique-indices hints: permutation gathers lower ~2x faster than
    # plain take at this scale on v5e (measured 100 -> 52 ms for the
    # sort+permute skeleton at 2M samples)
    sorted_x = x.at[perm].get(unique_indices=True, mode="clip")
    group_sizes = jnp.sum(
        ids[None, :] == jnp.arange(C, dtype=jnp.int32)[:, None],
        axis=1, dtype=jnp.int32)
    out_sorted = mlp_forward_grouped(params, sorted_x, group_sizes)
    return out_sorted.at[inv].get(unique_indices=True, mode="clip")


def mlp_forward_chunked(params: MLPParams, x_al: jax.Array,
                        chunk_cids: jax.Array, chunk: int) -> jax.Array:
    """Cluster-pure chunked batched-DENSE MLP forward.

    ``lax.ragged_dot`` measured ~9x off the dense-matmul floor on v5e
    (8-layer 256-wide chain at 1.44M samples: 67 vs 7 ms device time,
    probe 104), so the production dispatcher instead pads each
    cluster's sorted segment to a ``chunk`` multiple — every chunk is
    then cluster-PURE — and runs one batched dense einsum per layer
    with per-chunk gathered weights ([nb, in, out]; nb*256 KB of
    weight traffic, negligible).  The bias rides the epilogue as a
    broadcast add: the ragged path's ones-column augmentation cost
    ~60 ms/8 layers because a 257-wide f32 activation tile-pads to
    384 lanes (probe 103).  Measured: 11.2 ms device time for the
    same 8-layer chain (probe 105).

    Args:
      x_al: f32 [nb*chunk, in] cluster-sorted samples, each cluster's
        segment zero-padded to a ``chunk`` multiple.
      chunk_cids: i32 [nb] cluster id of each (pure) chunk.
    Returns f32 [nb*chunk, out] (pad rows contain garbage — callers
    gather only valid positions back).
    """
    nb = x_al.shape[0] // chunk
    h = x_al.reshape(nb, chunk, x_al.shape[-1])
    x0 = h
    L = len(params.weights)
    for l in range(L):
        if l in params.skips:
            h = jnp.concatenate([h, x0], axis=-1)
        w = params.weights[l][chunk_cids]      # [nb, in_l, out_l]
        b = params.biases[l][chunk_cids]       # [nb, out_l]
        h = jnp.einsum("bnk,bkm->bnm", h, w,
                       preferred_element_type=jnp.float32) \
            + b[:, None, :]
        if l < L - 1:
            h = jax.nn.relu(h)
    return h.reshape(nb * chunk, -1)


def _query_chunked(params: MLPParams, cluster_ids: jax.Array,
                   x: jax.Array, chunk: int) -> jax.Array:
    """Sort-once chunked-dense dispatch (traceable body): samples in
    ANY order -> outputs in the same order.

    Builds the cluster-aligned layout entirely on device with STATIC
    shapes: the aligned buffer is bounded by ``ceil(n/chunk)*chunk +
    C*chunk`` (each cluster wastes < one chunk of padding), so no host
    sync is needed to size it.  Both heavy row gathers carry honest
    hints: sorted-space first (unique permutation), then the
    nondecreasing aligned-slot expansion (indices_are_sorted)."""
    C = params.n_clusters
    n = x.shape[0]
    ids = jnp.clip(cluster_ids.astype(jnp.int32), 0, C - 1)
    perm = jnp.argsort(ids, stable=True)
    inv = jnp.argsort(perm, stable=True)
    sorted_x = x.at[perm].get(unique_indices=True, mode="clip")
    counts = jnp.sum(
        ids[None, :] == jnp.arange(C, dtype=jnp.int32)[:, None],
        axis=1, dtype=jnp.int32)                       # [C]
    cum = jnp.cumsum(counts)
    seg_start = cum - counts                           # exclusive
    cnt_al = -(-counts // chunk) * chunk
    cum_al = jnp.cumsum(cnt_al)
    al_start = cum_al - cnt_al
    P_al = (-(-n // chunk) + C) * chunk                # static bound
    s = jnp.arange(P_al, dtype=jnp.int32)
    # cluster of each aligned slot (tail slack clips to the last one —
    # its outputs are never read back)
    c_s = jnp.sum(s[:, None] >= al_start[None, :], axis=1,
                  dtype=jnp.int32) - 1
    c_s = jnp.clip(c_s, 0, C - 1)
    off = s - al_start[c_s]
    k = seg_start[c_s] + jnp.minimum(
        off, jnp.maximum(counts[c_s] - 1, 0))          # nondecreasing
    x_al = sorted_x.at[jnp.clip(k, 0, n - 1)].get(
        indices_are_sorted=True, mode="clip")
    chunk_cids = c_s.reshape(-1, chunk)[:, 0]
    out_al = mlp_forward_chunked(params, x_al, chunk_cids, chunk)
    # aligned position of sorted rank r, composed through inv so ONE
    # wide-row gather restores the caller's order
    r = jnp.arange(n, dtype=jnp.int32)
    c_r = jnp.clip(jnp.sum(r[:, None] >= seg_start[None, :], axis=1,
                           dtype=jnp.int32) - 1, 0, C - 1)
    s_r = al_start[c_r] + (r - seg_start[c_r])
    pos = s_r.at[inv].get(unique_indices=True, mode="clip")
    return out_al.at[pos].get(unique_indices=True, mode="clip")


def query_grouped(params: MLPParams, cluster_ids: jax.Array,
                  x: jax.Array) -> jax.Array:
    """Shape-adaptive grouped dispatch (traceable): chunked-dense at
    scale, one-hot all-clusters select for small batches (where C x
    FLOPs is cheaper than the sort/align skeleton)."""
    if x.shape[0] >= (1 << 16):
        return _query_chunked(params, cluster_ids, x, 1 << 13)
    ids = jnp.clip(cluster_ids.astype(jnp.int32), 0,
                   params.n_clusters - 1)
    return mlp_forward_all(params, ids, x)


_query_auto_jit = jax.jit(query_grouped)


def mlp_forward_all(params: MLPParams, cluster_ids: jax.Array,
                    x: jax.Array) -> jax.Array:
    """Fully-jittable per-sample-cluster forward.

    Evaluates every cluster's MLP on every sample and selects — O(n_clusters)
    FLOPs overhead but shape-static and collective-free, used inside jitted
    refinement steps and the multi-chip dry run.  The sorted/bucketed
    :meth:`MegaNeRFModel.query` path is the production dispatcher.
    """
    outs = jax.vmap(lambda c: mlp_forward(params, c, x))(
        jnp.arange(params.n_clusters))          # [C, n, out]
    return jnp.take_along_axis(
        outs, cluster_ids[None, :, None].astype(jnp.int32), axis=0)[0]


# ----------------------------------------------------------------------
class MegaNeRFModel:
    def __init__(self, params: MLPParams, grid_dim, min_position,
                 max_position, need_viewdir: bool,
                 need_appearance_embedding: bool,
                 torch_modules: Optional[list] = None):
        self.params = params
        self.grid_dim = np.asarray(grid_dim, np.int32).reshape(2)
        self.min_position = np.asarray(min_position, np.float32).reshape(-1)[:3]
        self.max_position = np.asarray(max_position, np.float32).reshape(-1)[:3]
        self.range = self.max_position - self.min_position
        self.need_viewdir = bool(need_viewdir)
        self.need_appearance_embedding = bool(need_appearance_embedding)
        # eager-torch fallback modules (None when conversion verified)
        self._torch_modules = torch_modules
        self._chunk_fns = {}

    @property
    def n_clusters(self) -> int:
        return self.params.n_clusters

    @property
    def output_dim(self) -> int:
        return self.params.output_dim

    # ------------------------------------------------------------------
    def query_device(self, cluster_ids, samples) -> jax.Array:
        """Fully on-device grouped dispatch (production path): one
        stable sort + chunked-dense batched matmuls
        (:func:`mlp_forward_chunked`) — O(1) dispatches and zero host
        syncs, vs the reference's per-cluster per-chunk loop with
        ``.item()`` syncs (cuda_renderer.cpp:165-203; :meth:`query`
        mirrors that loop and remains for parity / the eager-torch
        fallback).

        Args: cluster_ids [n] int, samples [n, in_dim].
        Returns f32 [n, out_dim] in the input order (device array).
        """
        if self._torch_modules is not None:
            return self.query(np.asarray(cluster_ids), samples)
        return _query_auto_jit(self.params,
                               jnp.asarray(cluster_ids).reshape(-1),
                               jnp.asarray(samples))

    def cluster_ids_device(self, points_yz: jax.Array) -> jax.Array:
        """Spatial cluster id from world (y, z), on device
        (rt_core.cuh:541-549)."""
        return cluster_ids_from_yz(
            points_yz[..., 0], points_yz[..., 1],
            jnp.asarray(self.grid_dim, jnp.int32),
            jnp.asarray(self.min_position, jnp.float32),
            jnp.asarray(self.range, jnp.float32))

    def cluster_ids_for_points(self, points_yz: np.ndarray) -> np.ndarray:
        """Spatial cluster id from world (y, z) (rt_core.cuh:541-549)."""
        g1 = np.clip((points_yz[..., 0] - self.min_position[1])
                     / self.range[1] * self.grid_dim[0],
                     0, self.grid_dim[0] - 1.0).astype(np.int32)
        g2 = np.clip((points_yz[..., 1] - self.min_position[2])
                     / self.range[2] * self.grid_dim[1],
                     0, self.grid_dim[1] - 1.0).astype(np.int32)
        # int32 like cluster_ids_device — an int16 here silently wrapped
        # for grids with > 32767 clusters (id = g1*grid_dim[1]+g2)
        return (g1 * self.grid_dim[1] + g2).astype(np.int32)

    # ------------------------------------------------------------------
    def _forward_chunk(self, cluster: int, x: jax.Array) -> jax.Array:
        if self._torch_modules is not None:
            import torch
            with torch.inference_mode():
                t = torch.from_numpy(np.asarray(x, np.float32))
                out = self._torch_modules[cluster](t, False)
            return jnp.asarray(out.numpy())
        n = x.shape[0]
        fn = self._chunk_fns.get(n)
        if fn is None:
            fn = jax.jit(lambda p, c, xx: mlp_forward(p, c, xx))
            self._chunk_fns[n] = fn
        return fn(self.params, jnp.int32(cluster), x)

    def query(self, cluster_ids, samples, nerf_batch_size: int = 1024,
              batch_mult: int = 1) -> jax.Array:
        """Cluster-sorted chunked batched inference.

        Mirrors ``query_submodules`` (``cuda_renderer.cpp:165-203``): sort
        samples by cluster, run each cluster's MLP over chunks of
        ``nerf_batch_size * batch_mult``, scatter results back to the
        original order.  Host-side segmenting matches the reference's
        ``.item()`` syncs; chunk sizes are bucketed to powers of two to
        bound the number of jit specializations.
        """
        cluster_ids = np.asarray(cluster_ids).reshape(-1)
        samples = jnp.asarray(samples)
        n = samples.shape[0]
        out = np.zeros((n, self.output_dim), np.float32)
        if n == 0:
            return jnp.asarray(out)
        order = np.argsort(cluster_ids, kind="stable")
        sorted_ids = cluster_ids[order]
        uniq, starts = np.unique(sorted_ids, return_index=True)
        ends = np.append(starts[1:], n)
        batch = max(1, nerf_batch_size * batch_mult)
        samples_np = np.asarray(samples, np.float32)
        for cluster, s, e in zip(uniq, starts, ends):
            for off in range(s, e, batch):
                hi = min(off + batch, e)
                idx = order[off:hi]
                chunk = samples_np[idx]
                m = int(hi - off)
                # pad to the next power-of-two bucket (min 256)
                pad = max(256, 1 << (m - 1).bit_length())
                if pad > m:
                    chunk = np.concatenate(
                        [chunk, np.zeros((pad - m, chunk.shape[1]),
                                         np.float32)])
                res = self._forward_chunk(int(cluster), jnp.asarray(chunk))
                out[idx] = np.asarray(res)[:m]
        return jnp.asarray(out)

    # ------------------------------------------------------------------
    @staticmethod
    def synthetic(data_dim: int = 4, n_clusters: int = 4,
                  hidden: int = 32, n_layers: int = 3,
                  need_viewdir: bool = False,
                  need_appearance_embedding: bool = False,
                  grid_dim=(2, 2), min_position=(-1.0, -1.0, -1.0),
                  max_position=(1.0, 1.0, 1.0),
                  seed: int = 0) -> "MegaNeRFModel":
        """Random-weight model for tests/benchmarks (no torchscript needed)."""
        rng = np.random.RandomState(seed)
        in_dim = 3 + (3 if need_viewdir else 0) \
            + (1 if need_appearance_embedding else 0)
        dims = [in_dim] + [hidden] * (n_layers - 1) + [data_dim + 1]
        weights, biases = [], []
        for l in range(len(dims) - 1):
            weights.append(jnp.asarray(
                rng.randn(n_clusters, dims[l], dims[l + 1]).astype(np.float32)
                / np.sqrt(dims[l])))
            biases.append(jnp.asarray(
                rng.randn(n_clusters, dims[l + 1]).astype(np.float32) * 0.1))
        params = MLPParams(weights=weights, biases=biases, skips=())
        assert int(np.prod(grid_dim)) == n_clusters
        return MegaNeRFModel(params, grid_dim, min_position, max_position,
                             need_viewdir, need_appearance_embedding)

    @staticmethod
    def from_torchscript(container_path: str,
                         verify: bool = True) -> "MegaNeRFModel":
        """Load + convert a TorchScript Mega-NeRF container
        (reference ``Impl::load_model``, cuda_renderer.cpp:518-543)."""
        import torch

        container = torch.jit.load(str(container_path), map_location="cpu")
        grid_dim = container.grid_dim.numpy()
        min_position = container.min_position.numpy()
        max_position = container.max_position.numpy()
        n = int(container.centroids.shape[0])
        need_viewdir = bool(container.need_viewdir)
        need_appearance = bool(container.need_appearance_embedding)
        modules = []
        for i in range(n):
            m = getattr(container, f"sub_module_{i}")
            m.eval()
            modules.append(m)

        in_dim = 3 + (3 if need_viewdir else 0) + (1 if need_appearance else 0)
        # NOTE: parameters must be read BEFORE torch.jit.freeze — freezing
        # folds them into the graph (the reference freezes at
        # cuda_renderer.cpp:533 because it only ever executes the graph).
        params, ok = _convert_modules(modules, in_dim, verify=verify)
        if ok:
            return MegaNeRFModel(params, grid_dim, min_position, max_position,
                                 need_viewdir, need_appearance)
        # fall back to eager torch execution (frozen for speed).  The
        # placeholder params must still advertise the TRUE output width
        # (query() sizes its result buffer from params.output_dim and
        # scatters the torch outputs into it) — probe it with one
        # forward; the hardcoded 4 broke every fallback model whose
        # MLPs emit data_dim+1 != 4.
        try:
            with torch.inference_mode():
                probe = torch.zeros(1, in_dim)
                try:
                    y = modules[0](probe, False)
                except Exception:
                    y = modules[0](probe)
            out_dim = int(y.shape[-1])
        except Exception:      # pragma: no cover - pathological module
            out_dim = params.output_dim
        if out_dim != params.output_dim:
            params = _dummy_params(len(modules), in_dim, out_dim)
        frozen = [torch.jit.freeze(m) if isinstance(
            m, torch.jit.ScriptModule) else m for m in modules]
        return MegaNeRFModel(params, grid_dim, min_position, max_position,
                             need_viewdir, need_appearance,
                             torch_modules=frozen)


def _convert_modules(modules, in_dim: int, verify: bool = True):
    """Extract Linear stacks from TorchScript modules into MLPParams.

    Skip-concat layers are inferred from weight shapes: a layer whose
    input width exceeds the running width by exactly ``in_dim`` is a
    NeRF-style raw-input reinjection.  Returns (params, verified_ok).
    """
    import torch

    all_layers = []
    skips_per_module = []
    for m in modules:
        layers = []
        for name, p in m.named_parameters():
            if name.endswith("weight") and p.dim() == 2:
                bias_name = name[:-len("weight")] + "bias"
                b = dict(m.named_parameters()).get(bias_name)
                layers.append((p.detach().numpy(),
                               None if b is None else b.detach().numpy()))
        # infer skips
        skips = []
        h = in_dim
        usable = True
        for l, (w, b) in enumerate(layers):
            out_d, in_d = w.shape
            if in_d == h:
                pass
            elif in_d == h + in_dim:
                skips.append(l)
            else:
                usable = False
                break
            h = out_d
        if not usable or not layers:
            return _dummy_params(len(modules), in_dim), False
        all_layers.append(layers)
        skips_per_module.append(tuple(skips))

    shapes = [tuple(w.shape for w, _ in ls) for ls in all_layers]
    if len(set(shapes)) != 1 or len(set(skips_per_module)) != 1:
        return _dummy_params(len(modules), in_dim), False

    n_layers = len(all_layers[0])
    weights, biases = [], []
    for l in range(n_layers):
        w = np.stack([ls[l][0].T for ls in all_layers])   # [C, in, out]
        b = np.stack([
            ls[l][1] if ls[l][1] is not None
            else np.zeros(ls[l][0].shape[0], np.float32)
            for ls in all_layers])
        weights.append(jnp.asarray(w.astype(np.float32)))
        biases.append(jnp.asarray(b.astype(np.float32)))
    params = MLPParams(weights=weights, biases=biases,
                       skips=skips_per_module[0])

    if verify:
        import torch
        x = np.random.RandomState(0).randn(8, in_dim).astype(np.float32)
        for c, m in enumerate(modules):
            try:
                with torch.inference_mode():
                    want = m(torch.from_numpy(x), False).numpy()
            except Exception:
                try:
                    with torch.inference_mode():
                        want = m(torch.from_numpy(x)).numpy()
                except Exception:
                    return params, False
            got = np.asarray(mlp_forward(params, jnp.int32(c),
                                         jnp.asarray(x)))
            if want.shape != got.shape or not np.allclose(
                    want, got, rtol=1e-4, atol=1e-4):
                return params, False
    return params, True


def cluster_ids_from_yz(y, z, grid_dim, min_position, pos_range):
    """THE spatial cluster-id grid over world (y, z)
    (rt_core.cuh:541-549, renderer_kernel.cu:154-167): one home for
    the clip/scale/linearize policy, jit-traceable in every argument.
    Shared by the guided collectors, the jitted refinement fill, and
    MegaNeRFModel.cluster_ids_device — keep them on this helper so the
    cluster assignment can never drift between paths."""
    gd = jnp.asarray(grid_dim)
    gdf = gd.astype(jnp.float32)
    mp = jnp.asarray(min_position, jnp.float32)
    rg = jnp.asarray(pos_range, jnp.float32)
    g1 = jnp.clip((y - mp[1]) / rg[1] * gdf[0],
                  0.0, gdf[0] - 1.0).astype(jnp.int32)
    g2 = jnp.clip((z - mp[2]) / rg[2] * gdf[1],
                  0.0, gdf[1] - 1.0).astype(jnp.int32)
    return g1 * gd[1].astype(jnp.int32) + g2


def _dummy_params(n_clusters: int, in_dim: int,
                  out_dim: int = 4) -> MLPParams:
    z = jnp.zeros((n_clusters, in_dim, out_dim), jnp.float32)
    b = jnp.zeros((n_clusters, out_dim), jnp.float32)
    return MLPParams(weights=[z], biases=[b], skips=())
