"""Device-derived tuning constants (utils.tuning) — the TPU analogue of
the reference's device-property launch sizing (``get_sp_cores`` /
``auto_cuda_threads``, /root/reference/src/cuda/common.cuh:75-110,
renderer_kernel.cu:14-28)."""

from mega_nerf_viewer_tpu.utils.tuning import (
    DeviceTuning, _level_cap_for_hbm, _odd_mult_128, device_tuning)


def test_v5e_resolves_to_measured_values():
    t = device_tuning("TPU v5 lite")
    assert t.chunk_size == 2176          # 17 sublane tiles, measured
    assert t.block == 64
    assert t.leaf_map_level_cap == 9     # 1.07 GiB map on 16 GiB HBM


def test_cpu_falls_back_to_v5e_values():
    t = device_tuning("cpu")
    assert t.chunk_size == 2176
    assert t.leaf_map_level_cap == 9


def test_attached_device_path_returns_sane_values():
    t = device_tuning()                  # conftest forces CPU
    assert isinstance(t, DeviceTuning)
    assert t.chunk_size % 128 == 0
    assert 6 <= t.leaf_map_level_cap <= 12


def test_v5p_widens_the_leaf_map_cap():
    t = device_tuning("TPU v5p")
    assert t.leaf_map_level_cap == 10    # 8.6 GiB map on 95 GiB HBM
    assert t.chunk_size == 2176          # same VMEM -> same chunk


def test_odd_multiple_rule():
    # never a power-of-two row count (2048 measured pathological)
    assert _odd_mult_128(2048) in (1920, 2176)
    assert (_odd_mult_128(2048) // 128) % 2 == 1
    assert _odd_mult_128(17 * 128) == 2176
    assert _odd_mult_128(100) == 384


def test_level_cap_scales_with_hbm():
    assert _level_cap_for_hbm(16 << 30) == 9
    assert _level_cap_for_hbm(95 << 30) == 10
    assert _level_cap_for_hbm(1 << 30) == 8
