"""Real spherical harmonics evaluation (degree <= 4) in JAX.

Semantics mirror the gsplat SH kernel surface consumed by the reference
(`spherical_harmonics(n, viewdirs, coeffs)` at sgn_splatfacto.py:939 and
scene_graph:285): coefficients are laid out (N, num_bases(max_degree), 3);
only bases up to the *active* degree `n` contribute; the caller adds +0.5
and clamps to >= 0.

TPU-first design: the evaluation is an (N, K) basis matrix contracted with
(N, K, 3) coefficients — a batched matvec that XLA maps onto the MXU; the
active-degree truncation is a static mask on the basis (shapes stay fixed
as `n` steps up during training, so no recompilation per sh-degree bump
when `n` is passed as a traced int and masking is used).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# RGB <-> SH DC conversions (sgn_splatfacto.py:57-70).
SH_C0 = 0.28209479177387814


def rgb2sh(rgb: jax.Array) -> jax.Array:
    return (rgb - 0.5) / SH_C0


def sh2rgb(sh: jax.Array) -> jax.Array:
    return sh * SH_C0 + 0.5


def num_sh_bases(degree: int) -> int:
    """(degree+1)^2, e.g. 16 for degree 3 (sgn_splatfacto.py:268)."""
    return (degree + 1) ** 2


# Standard real-SH constants (same values as gsplat / Inria 3DGS kernels).
_C1 = 0.4886025119029199
_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396)
_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
       0.3731763325901154, -0.4570457994644658, 1.445305721320277,
       -0.5900435899266435)
_C4 = (2.5033429417967046, -1.7701307697799304, 0.9461746957575601,
       -0.6690465435572892, 0.10578554691520431, -0.6690465435572892,
       0.47308734787878004, -1.7701307697799304, 0.6258357354491761)


def sh_basis(dirs: jax.Array, max_degree: int) -> jax.Array:
    """Evaluate real SH basis functions for unit directions.

    Args:
        dirs: (..., 3) unit direction vectors.
        max_degree: static int in [0, 4]; output has num_sh_bases(max_degree)
            basis values.

    Returns:
        (..., K) basis matrix with K = (max_degree+1)^2.
    """
    assert 0 <= max_degree <= 4
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    one = jnp.ones_like(x)
    out = [SH_C0 * one]
    if max_degree >= 1:
        out += [-_C1 * y, _C1 * z, -_C1 * x]
    if max_degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            _C2[0] * xy,
            _C2[1] * yz,
            _C2[2] * (2.0 * zz - xx - yy),
            _C2[3] * xz,
            _C2[4] * (xx - yy),
        ]
    if max_degree >= 3:
        out += [
            _C3[0] * y * (3.0 * xx - yy),
            _C3[1] * xy * z,
            _C3[2] * y * (4.0 * zz - xx - yy),
            _C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            _C3[4] * x * (4.0 * zz - xx - yy),
            _C3[5] * z * (xx - yy),
            _C3[6] * x * (xx - 3.0 * yy),
        ]
    if max_degree >= 4:
        out += [
            _C4[0] * xy * (xx - yy),
            _C4[1] * yz * (3.0 * xx - yy),
            _C4[2] * xy * (7.0 * zz - 1.0),
            _C4[3] * yz * (7.0 * zz - 3.0),
            _C4[4] * (zz * (35.0 * zz - 30.0) + 3.0),
            _C4[5] * xz * (7.0 * zz - 3.0),
            _C4[6] * (xx - yy) * (7.0 * zz - 1.0),
            _C4[7] * xz * (xx - 3.0 * yy),
            _C4[8] * (xx * (xx - 3.0 * yy) - yy * (3.0 * xx - yy)),
        ]
    return jnp.stack(out, axis=-1)


def eval_sh(active_degree, dirs: jax.Array, coeffs: jax.Array) -> jax.Array:
    """Evaluate SH color: sum_k coeffs[..., k, :] * basis_k(dir).

    Args:
        active_degree: int (python or traced). Bases with degree > active
            are masked to zero — matching gsplat's `n` argument where the
            training schedule unlocks one degree per 1000 steps
            (sgn_splatfacto.py:936).
        dirs: (N, 3) unit viewing directions.
        coeffs: (N, K, 3) SH coefficients; K determines the max degree.

    Returns:
        (N, 3) raw SH colors (caller applies +0.5 and clamp, matching
        sgn_splatfacto.py:940).
    """
    k = coeffs.shape[-2]
    max_degree = int(round(k ** 0.5)) - 1
    assert num_sh_bases(max_degree) == k, f"bad SH coeff count {k}"
    basis = sh_basis(dirs, max_degree)  # (N, K)
    # Per-basis degree: degree d occupies indices [d^2, (d+1)^2).
    base_degree = jnp.asarray(
        [d for d in range(max_degree + 1) for _ in range(2 * d + 1)],
        dtype=jnp.int32,
    )
    mask = (base_degree <= jnp.asarray(active_degree, jnp.int32)).astype(basis.dtype)
    basis = basis * mask
    # (N, K) x (N, K, 3) -> (N, 3): batched contraction, MXU-friendly.
    return jnp.einsum("nk,nkc->nc", basis, coeffs)
