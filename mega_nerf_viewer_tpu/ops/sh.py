"""Real spherical-harmonics basis evaluation (degrees 0..4).

TPU-native analogue of the reference's ``maybe_precalc_basis``
(reference: ``include/cuda/rt_core.cuh:13-68``).  Constants match the
reference (which cites https://github.com/google/spherical-harmonics)
digit for digit so SH colors agree with the CUDA viewer bit-for-bit in f32.

Evaluation is vectorized over a leading batch of directions: the per-ray
basis is computed once per frame and reused for every sample along the ray,
exactly like the CUDA kernel precomputes it per thread.
"""

from __future__ import annotations

import jax.numpy as jnp

# Supported basis sizes (degree 0,1,2,3,4).
SUPPORTED_BASIS_DIMS = (1, 4, 9, 16, 25)

_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396)
_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
       0.3731763325901154, -0.4570457994644658, 1.445305721320277,
       -0.5900435899266435)
_C4 = (2.5033429417967046, -1.7701307697799304, 0.9461746957575601,
       -0.6690465435572892, 0.10578554691520431, -0.6690465435572892,
       0.47308734787878004, -1.7701307697799304, 0.6258357354491761)


def eval_sh_basis(basis_dim: int, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the first ``basis_dim`` SH basis functions at unit ``dirs``.

    Args:
      basis_dim: one of 1, 4, 9, 16, 25 (static).
      dirs: float array ``[..., 3]`` of (assumed unit-norm) directions.

    Returns:
      float array ``[..., basis_dim]``.
    """
    if basis_dim not in SUPPORTED_BASIS_DIMS:
        raise ValueError(
            f"basis_dim must be one of {SUPPORTED_BASIS_DIMS}, got {basis_dim}")

    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    out = [jnp.full_like(x, _C0)]
    if basis_dim >= 4:
        out += [-_C1 * y, _C1 * z, -_C1 * x]
    if basis_dim >= 9:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            _C2[0] * xy,
            _C2[1] * yz,
            _C2[2] * (2.0 * zz - xx - yy),
            _C2[3] * xz,
            _C2[4] * (xx - yy),
        ]
    if basis_dim >= 16:
        out += [
            _C3[0] * y * (3 * xx - yy),
            _C3[1] * xy * z,
            _C3[2] * y * (4 * zz - xx - yy),
            _C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
            _C3[4] * x * (4 * zz - xx - yy),
            _C3[5] * z * (xx - yy),
            _C3[6] * x * (xx - 3 * yy),
        ]
    if basis_dim >= 25:
        out += [
            _C4[0] * xy * (xx - yy),
            _C4[1] * yz * (3 * xx - yy),
            _C4[2] * xy * (7 * zz - 1.0),
            _C4[3] * yz * (7 * zz - 3.0),
            _C4[4] * (zz * (35 * zz - 30) + 3),
            _C4[5] * xz * (7 * zz - 3),
            _C4[6] * (xx - yy) * (7 * zz - 1.0),
            _C4[7] * xz * (xx - 3 * yy),
            _C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)),
        ]
    return jnp.stack(out, axis=-1)


def masked_sh_basis(basis_dim: int, dirs: jnp.ndarray,
                    basis_min: int, basis_max: int) -> jnp.ndarray:
    """SH basis with entries outside [basis_min, basis_max] zeroed.

    Mirrors the basis_minmax trimming in the reference trace loop
    (``include/cuda/rt_core.cuh:203-209``).  ``basis_min``/``basis_max`` may
    be traced values; the mask is elementwise.
    """
    basis = eval_sh_basis(basis_dim, dirs)
    idx = jnp.arange(basis_dim)
    mask = (idx >= basis_min) & (idx <= basis_max)
    return jnp.where(mask, basis, 0.0)
