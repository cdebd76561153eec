"""ctypes bindings for the native data-path runtime (native/).

Loads ``libnerfview.so`` (built with ``make -C native``) and exposes:
  * :func:`load_npz` — mmap'd, multi-threaded npz reading (the
    reference's cnpy equivalent, re-designed; see
    native/nerfview_native.cpp).
  * :func:`vq_decode` — parallel vector-quantized color decode
    (reference ``n3tree.cpp:109-175`` semantics, both bug-compat and
    corrected index layouts).

Everything degrades gracefully: :func:`available` is False when the
library isn't built and callers fall back to the numpy implementations.
"""

from __future__ import annotations

import ctypes
import os
from typing import Dict, Optional

import numpy as np

_LIB = None
_TRIED = False

_DESCR_TO_DTYPE = {
    "<f2": np.float16, "<f4": np.float32, "<f8": np.float64,
    "<i1": np.int8, "<i2": np.int16, "<i4": np.int32, "<i8": np.int64,
    "<u1": np.uint8, "<u2": np.uint16, "<u4": np.uint32, "<u8": np.uint64,
    "|u1": np.uint8, "|i1": np.int8, "|b1": np.bool_,
}


def _lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # the env override must win over the bundled build (override-variable
    # semantics: a user pointing at a patched library expects it loaded)
    for cand in (os.environ.get("NERFVIEW_NATIVE_LIB", ""),
                 os.path.join(here, "native", "libnerfview.so")):
        if cand and os.path.exists(cand):
            try:
                lib = ctypes.CDLL(cand)
            except OSError:
                continue
            lib.nv_open.restype = ctypes.c_void_p
            lib.nv_open.argtypes = [ctypes.c_char_p]
            lib.nv_error.restype = ctypes.c_char_p
            lib.nv_error.argtypes = [ctypes.c_void_p]
            lib.nv_num_entries.restype = ctypes.c_int
            lib.nv_num_entries.argtypes = [ctypes.c_void_p]
            lib.nv_entry_name.restype = ctypes.c_char_p
            lib.nv_entry_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
            lib.nv_entry_info.restype = ctypes.c_int
            lib.nv_entry_info.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int64)]
            lib.nv_entry_read.restype = ctypes.c_int64
            lib.nv_entry_read.argtypes = [
                ctypes.c_void_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8)]
            lib.nv_read_many.restype = ctypes.c_int
            lib.nv_read_many.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.c_int]
            try:
                lib.nv_read_many_cap.restype = ctypes.c_int
                lib.nv_read_many_cap.argtypes = [
                    ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
                    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                    ctypes.POINTER(ctypes.c_int64), ctypes.c_int]
            except AttributeError:  # pragma: no cover - stale library
                lib.nv_read_many_cap = None
            lib.nv_close.argtypes = [ctypes.c_void_p]
            lib.nv_argsort_counts.restype = ctypes.c_int
            lib.nv_argsort_counts.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32)]
            lib.nv_vq_decode.argtypes = [
                ctypes.POINTER(ctypes.c_uint16),
                ctypes.POINTER(ctypes.c_uint16),
                ctypes.POINTER(ctypes.c_uint16),
                ctypes.POINTER(ctypes.c_uint16),
                ctypes.POINTER(ctypes.c_uint16),
                ctypes.c_int64, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int]
            _LIB = lib
            break
    return _LIB


def available() -> bool:
    return _lib() is not None


def load_npz(path: str) -> Dict[str, np.ndarray]:
    """Read every array of an npz with the native loader (parallel
    inflate across entries).  Raises RuntimeError on parse errors."""
    lib = _lib()
    if lib is None:
        raise RuntimeError("native library not built (make -C native)")
    h = lib.nv_open(path.encode())
    try:
        err = lib.nv_error(h).decode()
        if err:
            raise RuntimeError(f"nv_open: {err}")
        n = lib.nv_num_entries(h)
        names, arrays, ptrs, idxs = [], [], [], []
        for i in range(n):
            name = lib.nv_entry_name(h, i).decode()
            descr = ctypes.create_string_buffer(16)
            shape = (ctypes.c_int64 * 32)()
            ndim = lib.nv_entry_info(h, i, descr, shape)
            if ndim < 0:
                raise RuntimeError(
                    f"entry {name}: {lib.nv_error(h).decode()}")
            d = descr.value.decode()
            shp = tuple(shape[k] for k in range(ndim))
            if name.endswith(".npy"):
                name = name[:-4]
            if d.startswith("<U") or d.startswith(">U"):
                # unicode strings (data_format): read raw UTF-32 bytes
                count = int(d[2:]) if len(d) > 2 else 0
                nbytes = int(np.prod(shp or (1,))) * count * 4
                buf = np.empty(nbytes, np.uint8)
                arrays.append(("U", name, buf, shp, count))
            else:
                dt = _DESCR_TO_DTYPE.get(d)
                if dt is None:
                    raise RuntimeError(f"unsupported descr {d} in {name}")
                buf = np.empty(shp, dt)
                arrays.append(("A", name, buf, shp, 0))
            ptrs.append(buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
            idxs.append(i)
        idx_arr = (ctypes.c_int * n)(*idxs)
        ptr_arr = (ctypes.POINTER(ctypes.c_uint8) * n)(*ptrs)
        # pass each destination's capacity so a corrupt archive whose zip
        # size exceeds the npy descr*shape geometry fails instead of
        # overflowing the heap
        cap_arr = (ctypes.c_int64 * n)(
            *(buf.nbytes for _, _, buf, _, _ in arrays))
        if getattr(lib, "nv_read_many_cap", None):
            rc = lib.nv_read_many_cap(h, idx_arr, ptr_arr, cap_arr, n)
        else:  # pragma: no cover - stale library
            rc = lib.nv_read_many(h, idx_arr, ptr_arr, n)
        if rc:
            raise RuntimeError(f"read failed: {lib.nv_error(h).decode()}")
        out = {}
        for kind, name, buf, shp, count in arrays:
            if kind == "U":
                # decode UTF-32LE like the reference's every-4th-byte strip
                s = buf.tobytes().decode("utf-32-le").rstrip("\x00")
                out[name] = np.str_(s)
            else:
                out[name] = buf
        return out
    finally:
        lib.nv_close(h)


def vq_decode(quant_map: np.ndarray, quant_colors: np.ndarray,
              retained: Optional[np.ndarray], sigma: np.ndarray,
              data_dim: int, bug_compat: bool = True) -> np.ndarray:
    """Parallel native VQ decode -> f16 [capacity, N3, data_dim]."""
    lib = _lib()
    if lib is None:
        raise RuntimeError("native library not built")
    n_basis_q, capacity, n3 = quant_map.shape
    n_retain = retained.shape[0] if retained is not None else 0
    # the C loop indexes rows at c*n_basis(+basis) and the codebook at
    # a fixed 65536 stride — validate both BEFORE handing it raw
    # pointers (the numpy fallback raises IndexError for the same
    # inconsistent archives; the native path must not heap-overflow)
    n_basis = n_basis_q + n_retain
    if data_dim < 3 * n_basis + 1:
        raise ValueError(
            f"VQ arrays imply n_basis={n_basis} but data_dim={data_dim} "
            f"< {3 * n_basis + 1}")
    if quant_colors.shape[1:] != (65536, 3):
        raise ValueError(
            f"quant_colors must be [n_basis, 65536, 3] "
            f"(got {quant_colors.shape})")
    data = np.zeros((capacity, n3, data_dim), np.float16)

    def u16(a):
        a = np.ascontiguousarray(a)
        return a.view(np.uint16).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint16))

    qm = np.ascontiguousarray(quant_map.astype(np.uint16))
    qc = np.ascontiguousarray(quant_colors)
    sg = np.ascontiguousarray(sigma.astype(np.float16))
    rt = np.ascontiguousarray(retained) if retained is not None else None
    lib.nv_vq_decode(
        data.view(np.uint16).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint16)),
        qm.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        qc.view(np.uint16).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint16)),
        rt.view(np.uint16).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint16)) if rt is not None else None,
        sg.view(np.uint16).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint16)),
        capacity, n3, data_dim, n_basis_q, n_retain, int(bug_compat))
    return data


def argsort_counts(keys: np.ndarray, max_key: int = 1 << 20):
    """Stable counting-sort argsort of small non-negative int keys.
    Returns (perm, inv) int32 arrays; raises RuntimeError when the
    native library is unavailable or keys are out of range."""
    lib = _lib()
    if lib is None:
        raise RuntimeError("native library not built")
    keys = np.ascontiguousarray(keys, np.int32)
    n = keys.shape[0]
    perm = np.empty(n, np.int32)
    inv = np.empty(n, np.int32)
    rc = lib.nv_argsort_counts(
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n,
        np.int32(max_key),
        perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        inv.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc != 0:
        raise RuntimeError("keys out of range for counting sort")
    return perm, inv
