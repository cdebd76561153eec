import numpy as np
import pytest

from mega_nerf_viewer_tpu.ops.sh import eval_sh_basis, masked_sh_basis


def _reference_sh(d):
    """Scalar transliteration of maybe_precalc_basis (rt_core.cuh:22-59)."""
    x, y, z = d
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    out = np.zeros(25)
    out[0] = 0.28209479177387814
    out[1] = -0.4886025119029199 * y
    out[2] = 0.4886025119029199 * z
    out[3] = -0.4886025119029199 * x
    out[4] = 1.0925484305920792 * xy
    out[5] = -1.0925484305920792 * yz
    out[6] = 0.31539156525252005 * (2.0 * zz - xx - yy)
    out[7] = -1.0925484305920792 * xz
    out[8] = 0.5462742152960396 * (xx - yy)
    out[9] = -0.5900435899266435 * y * (3 * xx - yy)
    out[10] = 2.890611442640554 * xy * z
    out[11] = -0.4570457994644658 * y * (4 * zz - xx - yy)
    out[12] = 0.3731763325901154 * z * (2 * zz - 3 * xx - 3 * yy)
    out[13] = -0.4570457994644658 * x * (4 * zz - xx - yy)
    out[14] = 1.445305721320277 * z * (xx - yy)
    out[15] = -0.5900435899266435 * x * (xx - 3 * yy)
    out[16] = 2.5033429417967046 * xy * (xx - yy)
    out[17] = -1.7701307697799304 * yz * (3 * xx - yy)
    out[18] = 0.9461746957575601 * xy * (7 * zz - 1.0)
    out[19] = -0.6690465435572892 * yz * (7 * zz - 3.0)
    out[20] = 0.10578554691520431 * (zz * (35 * zz - 30) + 3)
    out[21] = -0.6690465435572892 * xz * (7 * zz - 3)
    out[22] = 0.47308734787878004 * (xx - yy) * (7 * zz - 1.0)
    out[23] = -1.7701307697799304 * xz * (xx - 3 * yy)
    out[24] = 0.6258357354491761 * (xx * (xx - 3 * yy) - yy * (3 * xx - yy))
    return out


@pytest.mark.parametrize("basis_dim", [1, 4, 9, 16, 25])
def test_sh_matches_reference_constants(basis_dim, rng):
    dirs = rng.randn(32, 3)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    got = np.asarray(eval_sh_basis(basis_dim, dirs.astype(np.float32)))
    for i in range(32):
        want = _reference_sh(dirs[i])[:basis_dim]
        np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-6)


def test_bad_basis_dim():
    with pytest.raises(ValueError):
        eval_sh_basis(7, np.zeros((1, 3), np.float32))


def test_masked_basis():
    dirs = np.array([[0.0, 0.0, 1.0]], np.float32)
    b = np.asarray(masked_sh_basis(9, dirs, 2, 5))
    assert np.all(b[0, :2] == 0)
    assert np.all(b[0, 6:] == 0)
    assert b[0, 2] != 0
