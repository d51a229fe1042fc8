"""EWA projection of 3D Gaussians to screen space — pure jnp, fully batched.

Reproduces the numerical semantics of the gsplat v0.1 `project_gaussians`
CUDA kernel surface consumed by the reference
(/root/reference/street_gaussians_ns/sgn_splatfacto.py:860-873):

  * view-space transform, near-clip at z <= clip_thresh,
  * 3D covariance R(q) diag(s)^2 R(q)^T,
  * perspective Jacobian with the 1.3x tan-FOV clamping of view coords,
  * 2D covariance + 0.3 px blur dilation on the diagonal,
  * `comp` = sqrt(det_orig / det_blurred) anti-alias compensation,
  * conic = inverse 2D covariance, 3-sigma pixel radius,
  * pixel-space center (fx x/z + cx, fy y/z + cy) and view depth.

This is an O(N) elementwise map; XLA fuses it into a handful of VPU loops,
so it needs no Pallas kernel. It is differentiable end-to-end (gradients to
means/scales/quats), doubling as both the production projection and the
oracle the rasterizer kernels are tested against.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from . import quaternions as quat

CLIP_THRESH = 0.01  # gsplat's default near-clip for projection validity.
BLUR_2D = 0.3       # screen-space blur added to the 2D covariance diagonal.


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Projected:
    """Screen-space Gaussian attributes, all shape (N, ...)."""

    xys: jax.Array      # (N, 2) pixel-space centers
    depths: jax.Array   # (N,)   view-space z
    radii: jax.Array    # (N,)   int32 3-sigma pixel radius; 0 = invisible
    conics: jax.Array   # (N, 3) upper-triangular inverse 2D covariance (a,b,c)
    comp: jax.Array     # (N,)   blur compensation factor in [0,1]
    num_tiles_hit: jax.Array  # (N,) int32 count of intersected tiles
    tile_box: jax.Array # (N, 4) int32 [x0, x1, y0, y1) tile bounds (exclusive hi)


def compute_cov3d(scales: jax.Array, quats: jax.Array) -> jax.Array:
    """3D covariance = R diag(s)^2 R^T. scales are linear (already exp'd)."""
    R = quat.to_rotmat(quat.normalize(quats))  # (N, 3, 3)
    M = R * scales[:, None, :]                 # scale columns
    return M @ jnp.swapaxes(M, -1, -2)


def project(
    means: jax.Array,
    scales: jax.Array,
    quats: jax.Array,
    viewmat: jax.Array,
    fx, fy, cx, cy,
    width: int,
    height: int,
    tile_size: int = 16,
    clip_thresh: float = CLIP_THRESH,
) -> Projected:
    """Project N Gaussians into screen space. All args traced except the
    static ints width/height/tile_size."""
    f32 = jnp.float32
    means = means.astype(f32)
    Rwc = viewmat[:3, :3].astype(f32)
    twc = viewmat[:3, 3].astype(f32)

    p_view = means @ Rwc.T + twc  # (N, 3)
    tz = p_view[:, 2]
    valid = tz > clip_thresh
    # Guard z for the divisions below (invalid entries are masked out at the end).
    tz_safe = jnp.where(valid, tz, 1.0)

    cov3d = compute_cov3d(scales.astype(f32), quats.astype(f32))  # (N, 3, 3)

    # FOV-clamped view coordinates feeding the Jacobian (gsplat semantics).
    tan_fovx = 0.5 * width / fx
    tan_fovy = 0.5 * height / fy
    lim_x = 1.3 * tan_fovx
    lim_y = 1.3 * tan_fovy
    tx = jnp.clip(p_view[:, 0] / tz_safe, -lim_x, lim_x) * tz_safe
    ty = jnp.clip(p_view[:, 1] / tz_safe, -lim_y, lim_y) * tz_safe

    rz = 1.0 / tz_safe
    rz2 = rz * rz
    # J (N, 2, 3): perspective Jacobian at the clamped point.
    zeros = jnp.zeros_like(tz)
    J = jnp.stack(
        [
            jnp.stack([fx * rz, zeros, -fx * tx * rz2], axis=-1),
            jnp.stack([zeros, fy * rz, -fy * ty * rz2], axis=-1),
        ],
        axis=-2,
    )
    T = J @ Rwc  # (N, 2, 3)
    cov2d = T @ cov3d @ jnp.swapaxes(T, -1, -2)  # (N, 2, 2)

    a = cov2d[:, 0, 0]
    b = cov2d[:, 0, 1]
    c = cov2d[:, 1, 1]
    det_orig = a * c - b * b
    a = a + BLUR_2D
    c = c + BLUR_2D
    det = a * c - b * b
    comp = jnp.sqrt(jnp.maximum(0.0, det_orig / jnp.where(det > 0, det, 1.0)))

    det_ok = det > 0
    det_safe = jnp.where(det_ok, det, 1.0)
    conics = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], axis=-1)

    # 3-sigma radius from the larger eigenvalue of the blurred 2D covariance.
    mid = 0.5 * (a + c)
    v1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(v1))

    center_x = fx * p_view[:, 0] * rz + cx
    center_y = fy * p_view[:, 1] * rz + cy
    xys = jnp.stack([center_x, center_y], axis=-1)

    # Tile bounds [x0, x1) x [y0, y1), clamped to the grid.
    ntx = (width + tile_size - 1) // tile_size
    nty = (height + tile_size - 1) // tile_size
    r = jax.lax.stop_gradient(radius_f)
    cxp = jax.lax.stop_gradient(center_x)
    cyp = jax.lax.stop_gradient(center_y)
    x0 = jnp.clip(jnp.floor((cxp - r) / tile_size), 0, ntx).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((cyp - r) / tile_size), 0, nty).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((cxp + r) / tile_size) + 1, 0, ntx).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((cyp + r) / tile_size) + 1, 0, nty).astype(jnp.int32)

    visible = valid & det_ok
    radii = jnp.where(visible, radius_f, 0.0).astype(jnp.int32)
    x1 = jnp.where(visible, jnp.maximum(x1, x0), x0)
    y1 = jnp.where(visible, jnp.maximum(y1, y0), y0)
    num_tiles = (x1 - x0) * (y1 - y0)
    num_tiles = jnp.where(visible, num_tiles, 0)

    return Projected(
        xys=xys,
        depths=tz,
        radii=radii,
        conics=conics,
        comp=comp,
        num_tiles_hit=num_tiles,
        tile_box=jnp.stack([x0, x1, y0, y1], axis=-1),
    )
