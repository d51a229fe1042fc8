"""Quaternion algebra in JAX.

Convention: wxyz (scalar-first), matching the reference stack's convention
(gsplat quats and pytorch3d.transforms.quaternion_multiply are both wxyz;
see /root/reference/street_gaussians_ns/sgn_splatfacto_scene_graph.py:416).

All functions are pure, broadcast over leading axes, and jit/vmap friendly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Normalize quaternions to unit norm. q: (..., 4).

    Safe at q == 0 in VALUE and GRADIENT: the classic max(norm, eps)
    guard still differentiates sqrt at 0 (0-cotangent x inf = NaN), which
    poisoned every zero-filled INACTIVE store slot's gradients — the
    double-where keeps both branches finite."""
    n2 = jnp.sum(q * q, axis=-1, keepdims=True)
    tiny = n2 < eps * eps
    norm = jnp.sqrt(jnp.where(tiny, 1.0, n2))
    return jnp.where(tiny, q, q / norm)


def to_rotmat(q: jax.Array) -> jax.Array:
    """Unit quaternion (..., 4) wxyz -> rotation matrix (..., 3, 3).

    Mirrors the semantics of gsplat's quat_to_rotmat used by the reference
    for split sampling (/root/reference/street_gaussians_ns/sgn_splatfacto.py:685).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a*b, wxyz. Broadcasts over leading axes."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def from_rotmat(m: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4) wxyz.

    Branch-free Shepperd's method (picks the numerically best of 4 forms),
    safe under jit. Matches nerfstudio's quaternion_from_matrix semantics
    (used by the reference's object2world transform, scene_graph:413).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate quaternions (each valid when its pivot is largest).
    def cand_w():
        s = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) * 2.0
        return jnp.stack([0.25 * s, (m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s], -1)

    def cand_x():
        s = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2.0
        return jnp.stack([(m21 - m12) / s, 0.25 * s, (m01 + m10) / s, (m02 + m20) / s], -1)

    def cand_y():
        s = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) * 2.0
        return jnp.stack([(m02 - m20) / s, (m01 + m10) / s, 0.25 * s, (m12 + m21) / s], -1)

    def cand_z():
        s = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) * 2.0
        return jnp.stack([(m10 - m01) / s, (m02 + m20) / s, (m12 + m21) / s, 0.25 * s], -1)

    qw, qx, qy, qz = cand_w(), cand_x(), cand_y(), cand_z()
    # Pivot selection.
    c0 = tr
    c1 = m00 - m11 - m22
    c2 = m11 - m00 - m22
    c3 = m22 - m00 - m11
    cands = jnp.stack([c0, c1, c2, c3], -1)
    idx = jnp.argmax(cands, axis=-1)
    q = jnp.where(
        (idx == 0)[..., None], qw,
        jnp.where((idx == 1)[..., None], qx, jnp.where((idx == 2)[..., None], qy, qz)),
    )
    return normalize(q)


def slerp(q0: jax.Array, q1: jax.Array, t: jax.Array) -> jax.Array:
    """Spherical linear interpolation between unit quaternions (wxyz).

    Used for tracked-box pose interpolation between annotation frames
    (reference: dynamic_annotation.py Box.interploate, scipy Slerp).
    """
    q0 = normalize(q0)
    q1 = normalize(q1)
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    # Take the short arc.
    q1 = jnp.where(dot < 0.0, -q1, q1)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(dot)
    sin_theta = jnp.sin(theta)
    # Fall back to lerp for nearly-parallel quats.
    use_lerp = sin_theta < 1e-6
    t = jnp.asarray(t)[..., None] if jnp.ndim(t) == jnp.ndim(q0) - 1 else jnp.asarray(t)
    w0 = jnp.where(use_lerp, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    w1 = jnp.where(use_lerp, t, jnp.sin(t * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    return normalize(w0 * q0 + w1 * q1)


def random_quats(key: jax.Array, n: int, dtype=jnp.float32) -> jax.Array:
    """Uniformly random unit quaternions (n, 4) wxyz.

    Same construction as the reference's random_quat_tensor
    (sgn_splatfacto.py:39-54): Shoemake subgroup algorithm.
    """
    ku, kv, kw = jax.random.split(key, 3)
    u = jax.random.uniform(ku, (n,), dtype)
    v = jax.random.uniform(kv, (n,), dtype)
    w = jax.random.uniform(kw, (n,), dtype)
    two_pi = 2.0 * jnp.pi
    return jnp.stack(
        [
            jnp.sqrt(1.0 - u) * jnp.sin(two_pi * v),
            jnp.sqrt(1.0 - u) * jnp.cos(two_pi * v),
            jnp.sqrt(u) * jnp.sin(two_pi * w),
            jnp.sqrt(u) * jnp.cos(two_pi * w),
        ],
        axis=-1,
    )


def rotate_vec(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors v (..., 3) by unit quaternions q (..., 4)."""
    qw = q[..., :1]
    qv = q[..., 1:]
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (qw * uv + uuv)
