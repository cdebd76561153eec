"""Device-derived tuning constants (VERDICT r4 item 8).

The reference sizes its CUDA launches from device properties at runtime:
``get_sp_cores`` maps the SM compute capability to cores/SM and
``auto_cuda_threads`` picks the block size from it
(``/root/reference/src/cuda/common.cuh:75-110``,
``/root/reference/src/cuda/renderer_kernel.cu:14-28``).  This module is
the TPU analogue: one inspection of the attached device yields the
march chunk size, hint-frame block, and the leaf-map level cap, instead
of v5e-tuned literals scattered through callers.

Derivations (each anchored to a measured v5e fact, PERFORMANCE.md):

* ``chunk_size`` — the march runs ``lax.map`` over cost-sorted ray
  chunks; each chunk's while-loop trips to ITS max step count, so the
  chunk size trades per-iteration overhead (small chunks) against
  chunk-max lane waste (large chunks).  On v5e the measured optimum is
  2176 rays = 17 sublane tiles of 128 (1.86x waste at 16k, ~1.2x at
  2k; exactly 2048 hits a pathological XLA layout, +30%).  The rule
  carried to other generations: an ODD multiple of 128 nearest
  ``17 * 128 * (vmem_mib / 128)`` — VMEM scales the live-state budget a
  chunk's march carries (v5e 128 MiB VMEM -> 2176; v5p/v4 keep the same
  VMEM so the value is stable across current generations; a future
  chip with more VMEM widens the chunk).
* ``block`` — spatial hint-frame pixel block (first-frame ray order);
  64 px matches the v5e VPU sublane tiling and is generation-stable.
* ``leaf_map_level_cap`` — leaf-map rows are ``[G^3, 2]`` i32 = 8 B per
  cell at ``G = 2^level``; the cap is the largest level whose map fits
  in ``hbm_bytes / 8`` (level 9 = 1.07 GiB on a 16 GiB v5e — the
  measured working config; a 95 GiB v5p admits level 10).  Deeper trees
  descend the residual levels per step (``LeafMap.deep_levels``).

Unknown accelerators (including CPU test runs) fall back to the
v5e-measured values — they are correctness-neutral everywhere.
"""

from __future__ import annotations

import dataclasses
import functools


# v5e-measured reference point (PERFORMANCE.md round-2 retunes)
_V5E_CHUNK = 2176            # 17 sublane tiles of 128
_V5E_BLOCK = 64
_V5E_HBM_GIB = 16.0
_V5E_VMEM_MIB = 128.0


@dataclasses.dataclass(frozen=True)
class DeviceTuning:
    chunk_size: int = _V5E_CHUNK
    block: int = _V5E_BLOCK
    leaf_map_level_cap: int = 9
    hbm_bytes: int = int(_V5E_HBM_GIB * (1 << 30))
    device_kind: str = "TPU v5 lite (assumed)"


def _odd_mult_128(target: float) -> int:
    """Nearest odd multiple of 128 to ``target`` (>= 384).

    Odd keeps the chunk off power-of-two row counts — exactly 2048
    measured a pathological XLA layout on v5e (+30%/frame)."""
    k = max(3, round(target / 128.0))
    if k % 2 == 0:
        k += 1 if (target / 128.0) >= k else -1
        k = max(3, k)
    return k * 128


def _level_cap_for_hbm(hbm_bytes: int) -> int:
    """Largest leaf-map level whose [G^3, 2]-i32 rows fit hbm/8."""
    budget_cells = max(1, hbm_bytes // 8) // 8   # 8 B per cell
    level = 6
    while (1 << (3 * (level + 1))) <= budget_cells and level < 12:
        level += 1
    return level


@functools.lru_cache(maxsize=None)
def device_tuning(device_kind: str | None = None) -> DeviceTuning:
    """Tuning constants for the attached (or named) accelerator.

    Pass ``device_kind`` for testing; ``None`` inspects
    ``jax.devices()[0]``.  Reference analogue: ``auto_cuda_threads``
    (renderer_kernel.cu:14-28) reading device-0 properties once.
    """
    hbm = int(_V5E_HBM_GIB * (1 << 30))
    vmem_mib = _V5E_VMEM_MIB
    kind = device_kind
    if kind is None:
        try:
            import jax
            dev = jax.devices()[0]
            kind = dev.device_kind
            stats = getattr(dev, "memory_stats", lambda: None)() or {}
            hbm = int(stats.get("bytes_limit", 0)) or hbm
        except Exception:
            kind = "unknown"
    k = (kind or "").lower()
    if "v5p" in k or "v4" in k:
        hbm = max(hbm, 95 * (1 << 30) if "v5p" in k else 32 * (1 << 30))
    elif "cpu" in k:
        # CPU test runs: tiny frames; keep the v5e values (correctness-
        # neutral) but cap the leaf map at the v5e level
        return DeviceTuning(device_kind=kind)
    chunk = _odd_mult_128(17 * 128 * (vmem_mib / _V5E_VMEM_MIB))
    return DeviceTuning(
        chunk_size=chunk,
        block=_V5E_BLOCK,
        leaf_map_level_cap=_level_cap_for_hbm(hbm),
        hbm_bytes=hbm,
        device_kind=kind or "unknown",
    )
