"""Differentiable cubemap sampling — replaces nvdiffrast's dr.texture(...,
boundary_mode='cube') used by the reference's sky EnvLight
(/root/reference/street_gaussians_ns/sgn_splatfacto.py:147).

Pure JAX: face selection by dominant axis + bilinear taps (gathers + lerps),
so XLA autodiff gives the backward for free and gradients reach the learned
cubemap texels. Face/uv conventions follow the OpenGL cubemap layout that
nvdiffrast implements (faces ordered +x,-x,+y,-y,+z,-z). Deviation: texel
filtering clamps at face edges instead of nvdiffrast's seamless cross-face
blending — sub-texel error confined to the 1-texel seam ring, invisible for
a learned 1024^2 sky.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cube_faces_uv(dirs: jax.Array):
    """Map direction vectors to (face_index, u, v) with u,v in [0, 1].

    dirs: (..., 3), need not be normalized.
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)

    # Dominant axis per pixel.
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    is_z = ~(is_x | is_y)

    eps = 1e-12
    ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    ma = jnp.maximum(ma, eps)

    pos_x = x >= 0
    pos_y = y >= 0
    pos_z = z >= 0

    face = jnp.where(
        is_x, jnp.where(pos_x, 0, 1),
        jnp.where(is_y, jnp.where(pos_y, 2, 3), jnp.where(pos_z, 4, 5)),
    ).astype(jnp.int32)

    # OpenGL cubemap (s, t) per face.
    u = jnp.where(
        is_x, jnp.where(pos_x, -z, z),
        jnp.where(is_y, x, jnp.where(pos_z, x, -x)),
    )
    v = jnp.where(
        is_x, -y,
        jnp.where(is_y, jnp.where(pos_y, z, -z), -y),
    )
    s = 0.5 * (u / ma + 1.0)
    t = 0.5 * (v / ma + 1.0)
    return face, s, t


def sample_cubemap(cubemap: jax.Array, dirs: jax.Array) -> jax.Array:
    """Bilinear cubemap lookup.

    Args:
        cubemap: (6, R, R, C) texture (faces +x,-x,+y,-y,+z,-z).
        dirs: (..., 3) directions.

    Returns:
        (..., C) sampled colors, differentiable w.r.t. cubemap and dirs.
    """
    R = cubemap.shape[1]
    face, s, t = cube_faces_uv(dirs)

    # Texel coordinates; centers at half-integers.
    fx = s * R - 0.5
    fy = t * R - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0

    def tap(xi, yi):
        xi = jnp.clip(xi, 0, R - 1).astype(jnp.int32)
        yi = jnp.clip(yi, 0, R - 1).astype(jnp.int32)
        return cubemap[face, yi, xi]

    c00 = tap(x0, y0)
    c10 = tap(x0 + 1, y0)
    c01 = tap(x0, y0 + 1)
    c11 = tap(x0 + 1, y0 + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    return (
        c00 * (1 - wx) * (1 - wy)
        + c10 * wx * (1 - wy)
        + c01 * (1 - wx) * wy
        + c11 * wx * wy
    )
