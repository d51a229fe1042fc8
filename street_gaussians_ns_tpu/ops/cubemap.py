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
import numpy as np


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


def sample_cubemap(cubemap: jax.Array, dirs: jax.Array,
                   method: str = "auto",
                   dirs_grad: bool = False) -> jax.Array:
    """Bilinear cubemap lookup.

    Args:
        cubemap: (6, R, R, C) texture (faces +x,-x,+y,-y,+z,-z).
        dirs: (..., 3) directions.
        method: "auto" | "gather" | "matmul". XLA:TPU gathers run
            element-serial (~14 ms PER TAP at 1.7M pixels regardless of
            table size, and the backward's scatter-adds are worse —
            ~105 ms of a train step); for R <= 128 the one-hot MXU
            formulation below replaces all of it with two matmuls per
            pixel chunk (~10 ms fwd+bwd). "auto" = matmul on TPU when
            R <= 128 AND dirs need no gradient, gather otherwise.
        dirs_grad: callers that need gradients to flow THROUGH the
            sampling geometry into `dirs` (camera-pose optimization
            through the sky) must pass True: the matmul path
            stop-gradients (face, s, t), so "auto" then picks the
            gather path instead of silently dropping pose gradients.

    Returns:
        (..., C) sampled colors, differentiable w.r.t. cubemap (both
        paths) and dirs (gather path only).
    """
    R = cubemap.shape[1]
    if method == "auto":
        method = ("matmul" if R <= 128 and not dirs_grad
                  and jax.default_backend() == "tpu" else "gather")
    if method == "matmul":
        return _sample_cubemap_matmul(cubemap, dirs)
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


def _sample_cubemap_matmul(cubemap: jax.Array, dirs: jax.Array,
                           chunk: int = 131072) -> jax.Array:
    """Bilinear cube sample as two MXU contractions per pixel chunk.

    The bilinear tap is separable: color[p] = sum_r WROW[p, r] *
    sum_j WX[p, j] * T[r, j, :] with WROW a (face*R + y)-indexed two-tap
    row weight and WX the two-tap column weight. The row contraction is a
    dense (chunk, 6R) @ (6R, R*C) matmul (one-hot-with-weights lhs) and
    the column contraction a (chunk, R)-weighted reduce — no gather or
    scatter anywhere, so the backward (cotangent of the cubemap) is the
    transposed matmul accumulated over chunks. Edge clamping falls out of
    clipping both taps to the same texel (their weights then sum to 1).
    Numerically identical to the gather path up to f32 summation order.
    Sampling geometry (face, s, t) is stop-gradiented — see
    sample_cubemap."""
    R = cubemap.shape[1]
    C = cubemap.shape[-1]
    face, s, t = cube_faces_uv(dirs)
    face = jax.lax.stop_gradient(face)
    s = jax.lax.stop_gradient(s)
    t = jax.lax.stop_gradient(t)
    batch_shape = face.shape
    p = int(np.prod(batch_shape)) if batch_shape else 1

    fx = (s * R - 0.5).reshape(-1)
    fy = (t * R - 0.5).reshape(-1)
    facef = face.reshape(-1)
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0
    x0c = jnp.clip(x0, 0, R - 1).astype(jnp.int32)
    x1c = jnp.clip(x0 + 1, 0, R - 1).astype(jnp.int32)
    r0 = facef * R + jnp.clip(y0, 0, R - 1).astype(jnp.int32)
    r1 = facef * R + jnp.clip(y0 + 1, 0, R - 1).astype(jnp.int32)

    pad = (-p) % chunk
    def pad1(x):
        return jnp.pad(x, (0, pad))

    nb = (p + pad) // chunk
    xs = jax.tree.map(
        lambda x: pad1(x).reshape(nb, chunk),
        (r0, r1, x0c, x1c, wx.astype(jnp.float32), wy.astype(jnp.float32)))
    tflat = cubemap.reshape(6 * R, R * C)
    krow = jax.lax.broadcasted_iota(jnp.int32, (1, 6 * R), 1)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1)

    def body(_, args):
        cr0, cr1, cx0, cx1, cwx, cwy = args
        wrow = ((krow == cr0[:, None]) * (1.0 - cwy[:, None])
                + (krow == cr1[:, None]) * cwy[:, None])
        a = (wrow @ tflat).reshape(chunk, R, C)
        wcol = ((kcol == cx0[:, None]) * (1.0 - cwx[:, None])
                + (kcol == cx1[:, None]) * cwx[:, None])
        out = jnp.sum(a * wcol[..., None], axis=1)
        return _, out

    _, outs = jax.lax.scan(body, None, xs)
    return outs.reshape(-1, C)[:p].reshape(*batch_shape, C)
