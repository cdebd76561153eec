"""N3Tree: PlenOctree sparse voxel octree as a JAX pytree.

TPU-native analogue of the reference's ``N3Tree``
(reference: ``src/n3tree/n3tree.cpp``, ``include/n3tree/n3tree.hpp``,
``include/data_spec.hpp:25-50``).

Data model (shared contract of every kernel):
  * ``data: f16[max_capacity, N^3, data_dim]`` — per-leaf payload.
    ``data_dim = 3*basis_dim + 1``; SH coefficients are channel-major
    (R's basis_dim coeffs, then G, then B) with sigma LAST
    (``rt_core.cuh:231``).
  * ``child: i32[max_capacity, N^3]`` — RELATIVE chunk offset to the child
    chunk; 0 means leaf (``rt_core.cuh:146-153``).
  * ``parent: i32[max_capacity]`` — packed ``parent_chunk*N^3 + child_slot``
    (built from npz ``parent_depth[:, 0]``, ``n3tree.cpp:99-107``).
  * ``sample_counts: i16[max_capacity, N^3]`` — MLP sample count per leaf,
    initialized to 8 (``n3tree.cpp:191-193``).
  * ``scale: f32[3]``, ``offset: f32[3]`` — world→tree map
    ``q = offset + scale * x`` (``n3tree.cpp:46-62``).
  * ``capacity: i32[] scalar`` — live chunk count (traced, so refinement
    stays inside jit); arrays are over-allocated to the static
    ``max_capacity`` with the tail used for growth, mirroring
    ``move_to_device`` (``n3tree.cpp:207-246``).

The class is a registered JAX pytree: array fields are leaves, the
geometry/metadata fields are static aux data, so an ``N3Tree`` passes
directly through ``jit`` / ``shard_map`` and specializes compilation on
(N, data_dim, format, max_capacity).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .data_format import DataFormat, SH


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class N3Tree:
    # --- pytree leaves (device arrays) ---
    data: jax.Array          # f16 [max_capacity, N^3, data_dim]
    child: jax.Array         # i32 [max_capacity, N^3]
    parent: jax.Array        # i32 [max_capacity]
    sample_counts: jax.Array  # i16 [max_capacity, N^3]
    scale: jax.Array         # f32 [3]
    offset: jax.Array        # f32 [3]
    capacity: jax.Array      # i32 scalar (live chunk count)

    # --- static metadata ---
    N: int = dataclasses.field(metadata=dict(static=True), default=2)
    data_dim: int = dataclasses.field(metadata=dict(static=True), default=4)
    data_format: DataFormat = dataclasses.field(
        metadata=dict(static=True), default_factory=DataFormat)

    # ------------------------------------------------------------------
    # Derived geometry
    # ------------------------------------------------------------------
    @property
    def N3(self) -> int:
        return self.N ** 3

    @property
    def max_capacity(self) -> int:
        return self.data.shape[0]

    @property
    def basis_dim(self) -> int:
        return self.data_format.basis_dim

    def pack_index(self, nd: int, i: int, j: int, k: int) -> int:
        """Pack (chunk, i, j, k) into a flat node id (``n3tree.cpp:331-335``)."""
        assert 0 <= i < self.N and 0 <= j < self.N and 0 <= k < self.N
        return nd * self.N3 + i * self.N * self.N + j * self.N + k

    def unpack_index(self, packed: int) -> Tuple[int, int, int, int]:
        """Inverse of :meth:`pack_index` (``n3tree.cpp:337-345``)."""
        k = packed % self.N
        packed //= self.N
        j = packed % self.N
        packed //= self.N
        i = packed % self.N
        packed //= self.N
        return packed, i, j, k

    # ------------------------------------------------------------------
    # Construction
    # ------------------------------------------------------------------
    @staticmethod
    def from_arrays(data: np.ndarray, child: np.ndarray,
                    parent: np.ndarray, scale: np.ndarray,
                    offset: np.ndarray, data_format: DataFormat,
                    sample_counts: Optional[np.ndarray] = None,
                    max_capacity: Optional[int] = None,
                    capacity: Optional[int] = None) -> "N3Tree":
        """Build a device tree from host arrays, padding to ``max_capacity``.

        Mirrors ``N3Tree::move_to_device`` (``n3tree.cpp:207-246``): arrays
        are over-allocated and the first ``capacity`` rows filled.  The
        padding is zero (the reference leaves it uninitialized; zero is a
        strict refinement since a zero child row is a valid leaf chunk).
        """
        cap = int(data.shape[0]) if capacity is None else int(capacity)
        n3 = int(child.shape[1])
        n = round(n3 ** (1.0 / 3.0))
        if n * n * n != n3:
            raise ValueError(f"child.shape[1]={n3} is not a cube")
        data_dim = int(data.shape[2])
        max_cap = cap if max_capacity is None else int(max_capacity)
        if max_cap < cap:
            raise ValueError("max_capacity smaller than current capacity")

        def _pad(a: np.ndarray, fill=0) -> np.ndarray:
            out = np.zeros((max_cap,) + a.shape[1:], dtype=a.dtype)
            if fill != 0:
                out[...] = fill
            out[:cap] = a[:cap]
            return out

        if sample_counts is None:
            # init-to-8 per reference n3tree.cpp:191-193
            sample_counts = np.full((cap, n3), 8, dtype=np.int16)
        return N3Tree(
            data=jnp.asarray(_pad(data.astype(np.float16))),
            child=jnp.asarray(_pad(child.astype(np.int32))),
            parent=jnp.asarray(_pad(parent.astype(np.int32))),
            sample_counts=jnp.asarray(_pad(sample_counts.astype(np.int16))),
            scale=jnp.asarray(np.asarray(scale, dtype=np.float32)),
            offset=jnp.asarray(np.asarray(offset, dtype=np.float32)),
            capacity=jnp.asarray(cap, dtype=jnp.int32),
            N=n,
            data_dim=data_dim,
            data_format=data_format,
        )

    @staticmethod
    def open(path: str, max_capacity: Optional[int] = None,
             bounds_only: bool = False,
             vq_bug_compat: bool = True) -> "N3Tree":
        """Load a PlenOctree ``.npz`` in the svox schema.

        Mirrors ``N3Tree::open`` + ``load_npz`` (``n3tree.cpp:16-205``),
        including vector-quantized color decode, and ``move_to_device``
        padding when ``max_capacity`` is given.  ``bounds_only`` truncates
        the tree to the root chunk with all leaves, replicating the
        ``--bounds_only`` flag (``main.cpp:529-539``).
        """
        if not str(path).endswith(".npz"):
            raise ValueError("expected a .npz file")
        # prefer the native mmap'd multi-threaded loader (native.py /
        # native/nerfview_native.cpp); numpy is the portable fallback
        from .. import native
        if native.available():
            try:
                npz = native.load_npz(str(path))
            except RuntimeError:
                npz = np.load(path, allow_pickle=False)
        else:
            npz = np.load(path, allow_pickle=False)
        host = load_npz_host(npz, vq_bug_compat=vq_bug_compat)
        (data, child, parent, scale, offset, data_format,
         sample_counts) = host
        if bounds_only:
            data = data[:1]
            child = np.zeros_like(child[:1])
            parent = parent[:1]
            if sample_counts is not None:
                sample_counts = sample_counts[:1]
        return N3Tree.from_arrays(
            data, child, parent, scale, offset, data_format,
            sample_counts=sample_counts, max_capacity=max_capacity)

    # ------------------------------------------------------------------
    # Persistence (new capability: the reference never writes the refined
    # tree back; this provides checkpoint/resume for refinement sessions)
    # ------------------------------------------------------------------
    def save_npz(self, path: str) -> None:
        """Write the live portion of the tree back in the svox schema."""
        cap = int(self.capacity)
        parent_depth = np.zeros((cap, 2), dtype=np.int32)
        parent = np.asarray(self.parent[:cap])
        parent_depth[:, 0] = parent
        # svox stores per-chunk DEPTH in column 1 (our loader reads only
        # column 0, n3tree.cpp:99-107, but svox consumers of a re-saved
        # tree need the real values, not zeros).  Reconstruct from the
        # parent chain: depth(chunk) = depth(parent chunk) + 1, root 0;
        # children are allocated after parents so the fixpoint converges
        # in tree-depth iterations of a vectorized gather.
        pc = np.clip(parent // self.N3, 0, max(cap - 1, 0))
        depth = np.zeros(cap, dtype=np.int32)
        nonroot = np.arange(cap) > 0
        for _ in range(64):
            nd = np.where(nonroot, depth[pc] + 1, 0).astype(np.int32)
            if np.array_equal(nd, depth):
                break
            depth = nd
        parent_depth[:, 1] = depth
        np.savez(
            path,
            data_dim=np.int64(self.data_dim),
            data_format=np.str_(self.data_format.to_string()),
            invradius3=np.asarray(self.scale, dtype=np.float32),
            offset=np.asarray(self.offset, dtype=np.float32),
            child=np.asarray(self.child[:cap]).reshape(
                cap, self.N, self.N, self.N),
            parent_depth=parent_depth,
            data=np.asarray(self.data[:cap], dtype=np.float16),
            sample_counts=np.asarray(self.sample_counts[:cap]),
        )

    # ------------------------------------------------------------------
    # Debug visualization
    # ------------------------------------------------------------------
    def gen_wireframe(self, max_depth: int = 4) -> np.ndarray:
        """Generate world-space AABB corners of leaf voxels for debugging.

        Functional analogue of ``N3Tree::gen_wireframe``
        (``n3tree.cpp:324-329``): returns ``[n_boxes, 6]`` world AABBs
        (min_xyz, max_xyz) for every node that is a leaf or at
        ``max_depth``.  (The reference emits GL line-list vertices; the
        box list is the headless equivalent — line segments are derivable.)
        """
        child = np.asarray(self.child[: int(self.capacity)])
        scale = np.asarray(self.scale)
        offset = np.asarray(self.offset)
        boxes = []

        def rec(nodeid: int, xi: int, yi: int, zi: int, depth: int,
                gridsz: int) -> None:
            cnt = 0
            for i in range(xi * self.N, (xi + 1) * self.N):
                for j in range(yi * self.N, (yi + 1) * self.N):
                    for k in range(zi * self.N, (zi + 1) * self.N):
                        c = int(child[nodeid, cnt])
                        if c == 0 or depth >= max_depth:
                            lo = (np.array([i, j, k], np.float32) / gridsz
                                  - offset) / scale
                            hi = (np.array([i + 1, j + 1, k + 1], np.float32)
                                  / gridsz - offset) / scale
                            boxes.append(np.concatenate([lo, hi]))
                        else:
                            rec(nodeid + c, i, j, k, depth + 1,
                                gridsz * self.N)
                        cnt += 1

        rec(0, 0, 0, 0, 0, self.N)
        if not boxes:
            return np.zeros((0, 6), np.float32)
        return np.stack(boxes).astype(np.float32)


# ----------------------------------------------------------------------
# Host-side npz decoding
# ----------------------------------------------------------------------
def _decode_data_format(npz) -> Tuple[int, DataFormat]:
    """Read data_dim and the data_format string.

    The reference reads the raw npy payload and takes every 4th byte
    because svox saves the string as UTF-32 (``n3tree.cpp:33-37``);
    numpy decodes '<U' dtypes natively so both paths land on the same text.
    """
    data_dim = int(np.asarray(npz["data_dim"]).reshape(-1)[0])
    raw = npz["data_format"]
    arr = np.asarray(raw)
    if arr.dtype.kind in ("U", "S"):
        s = arr.reshape(-1)[0]
        if isinstance(s, bytes):
            s = s.decode("utf-8")
    else:
        # raw byte payload: strip UTF-32 like the reference
        b = arr.tobytes()
        s = b[::4].decode("ascii")
    return data_dim, DataFormat.parse(str(s))


def load_npz_host(npz, vq_bug_compat: bool = True):
    """Decode an svox npz into host arrays.

    Returns (data f16, child i32 [cap, N^3], parent i32, scale f32[3],
    offset f32[3], data_format, sample_counts i16 or None).
    ``sample_counts`` is this package's checkpoint extension
    (:meth:`N3Tree.save_npz`); reading it back keeps resumed refinement
    sessions' incremental means correctly weighted.  Plain svox files
    don't carry it (the reference initializes counts to 8,
    ``n3tree.cpp:191-193``) — None defers to that default.

    Mirrors ``N3Tree::load_npz`` (``n3tree.cpp:28-205``):
      * ``invradius3`` (vector) or ``invradius`` (scalar) -> scale
      * ``parent_depth[:, 0]`` -> parent
      * fp16 ``data`` required, or VQ decode from ``quant_colors`` (fp16
        codebook ``[n_basis_q, 65536, 3]``) + ``quant_map`` (uint16
        ``[n_basis_q, cap, N^3]``) + optional ``data_retained`` + ``sigma``.

    VQ decode compatibility: the reference writes every decoded basis to
    data index ``channel * n_basis`` (``n3tree.cpp:145,161``) — i.e. later
    bases overwrite earlier ones and the per-basis slots are never filled
    (a reference bug that is only correct for n_basis == 1).
    ``vq_bug_compat=True`` replicates that observed behavior (with the
    uninitialized remainder zeroed); ``False`` uses the evidently intended
    index ``channel * n_basis + basis``.
    """
    data_dim, data_format = _decode_data_format(npz)

    if "invradius3" in npz:
        scale = np.asarray(npz["invradius3"], dtype=np.float32).reshape(3)
    else:
        scale = np.full(
            3, float(np.asarray(npz["invradius"]).reshape(-1)[0]),
            dtype=np.float32)
    offset = np.asarray(npz["offset"], dtype=np.float32).reshape(3)

    child_node = np.asarray(npz["child"])
    n = int(child_node.shape[1])
    n3 = n * n * n
    child = child_node.reshape(child_node.shape[0], n3).astype(np.int32)

    parent_depth = np.asarray(npz["parent_depth"])
    if parent_depth.itemsize != 4:
        raise ValueError("parent_depth must be 4-byte ints")
    parent = parent_depth.reshape(parent_depth.shape[0], -1)[:, 0].astype(
        np.int32)

    if "quant_colors" in npz:
        data = _decode_vq(npz, data_dim, n3, vq_bug_compat)
    else:
        data_node = np.asarray(npz["data"])
        if data_node.dtype != np.float16:
            raise ValueError("data must be stored in half precision")
        data = data_node.reshape(data_node.shape[0], n3, data_dim)

    if data.shape[0] != parent.shape[0]:
        raise ValueError("data and parent sizes not aligned")
    if data.shape[0] != child.shape[0]:
        raise ValueError("data and child sizes not aligned")
    sample_counts = None
    if "sample_counts" in npz:
        sc = np.asarray(npz["sample_counts"])
        if sc.shape[0] == data.shape[0]:
            sample_counts = sc.reshape(sc.shape[0], -1).astype(np.int16)
    return data, child, parent, scale, offset, data_format, sample_counts


def _decode_vq(npz, data_dim: int, n3: int, bug_compat: bool) -> np.ndarray:
    """Vectorized VQ color decode (reference ``n3tree.cpp:109-175``)."""
    quant_colors = np.asarray(npz["quant_colors"])       # [nq, 65536, 3] f16
    if quant_colors.dtype != np.float16:
        raise ValueError("codebook must be stored in half precision")
    quant_map = np.asarray(npz["quant_map"]).astype(np.int64)  # [nq, cap, N3]
    n_basis_q = quant_map.shape[0]
    if quant_colors.shape[0] != n_basis_q:
        raise ValueError("codebook and map basis numbers does not match")
    retained = np.asarray(npz["data_retained"]) if "data_retained" in npz \
        else None
    n_retain = retained.shape[0] if retained is not None else 0
    n_basis = n_basis_q + n_retain
    capacity = quant_map.shape[1]

    from .. import native
    if native.available():
        sigma_arr = np.asarray(npz["sigma"]).reshape(capacity, n3)
        return native.vq_decode(
            np.asarray(npz["quant_map"]), quant_colors,
            retained.reshape(n_retain, capacity, n3).astype(np.float16)
            if retained is not None else None,
            sigma_arr, data_dim, bug_compat=bug_compat)

    data = np.zeros((capacity, n3, data_dim), dtype=np.float16)
    # decoded[b, i, j, channel] for quantized bases b in [n_retain, n_basis)
    decoded = quant_colors[np.arange(n_basis_q)[:, None, None],
                           quant_map]                     # [nq, cap, N3, 3]
    for b in range(n_basis_q):
        basis = n_retain + b
        for ch in range(3):
            idx = ch * n_basis if bug_compat else ch * n_basis + basis
            data[:, :, idx] = decoded[b, :, :, ch]
    if n_retain:
        # reference reads retain_ptr[b*cap*N3 + i*N3 + j + channel]: three
        # consecutive scalars of the flat [n_retain, cap, N3] buffer.
        flat = retained.reshape(-1)
        base = (np.arange(n_retain)[:, None, None] * capacity * n3
                + np.arange(capacity)[None, :, None] * n3
                + np.arange(n3)[None, None, :])
        for b in range(n_retain):
            for ch in range(3):
                idx = ch * n_basis if bug_compat else ch * n_basis + b
                src = np.minimum(base[b] + ch, flat.shape[0] - 1)
                data[:, :, idx] = flat[src]
    sigma = np.asarray(npz["sigma"]).reshape(capacity, n3)
    data[:, :, data_dim - 1] = sigma
    return data
