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


def _cov3d_components(scales, quats):
    """Upper-triangular 3D covariance as six (N,) arrays.

    Componentwise on purpose: (N, 3, 3) intermediates put the 3-wide axes
    on TPU lanes (125/128 wasted); (N,) arrays tile as (8, 128) densely —
    this is the difference between ~85 ms and ~5 ms per million gaussians.
    """
    # Double-where zero-safe normalize (see core.quaternions.normalize):
    # inactive store slots hold all-zero quats, and the max(norm, eps)
    # guard alone still produces NaN GRADIENTS at 0 (0-cotangent x the
    # sqrt's infinite slope), which then poisons the whole inactive row's
    # parameters through Adam.
    n2 = jnp.sum(quats * quats, axis=-1, keepdims=True)
    tiny = n2 < 1e-24
    q = jnp.where(tiny, quats, quats / jnp.sqrt(jnp.where(tiny, 1.0, n2)))
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    # Rotation matrix entries (same formulas as quaternions.to_rotmat).
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    s0 = scales[:, 0] ** 2
    s1 = scales[:, 1] ** 2
    s2 = scales[:, 2] ** 2
    # cov = R diag(s^2) R^T
    c00 = r00 * r00 * s0 + r01 * r01 * s1 + r02 * r02 * s2
    c01 = r00 * r10 * s0 + r01 * r11 * s1 + r02 * r12 * s2
    c02 = r00 * r20 * s0 + r01 * r21 * s1 + r02 * r22 * s2
    c11 = r10 * r10 * s0 + r11 * r11 * s1 + r12 * r12 * s2
    c12 = r10 * r20 * s0 + r11 * r21 * s1 + r12 * r22 * s2
    c22 = r20 * r20 * s0 + r21 * r21 * s1 + r22 * r22 * s2
    return c00, c01, c02, c11, c12, c22


def coverage_q(op):
    """Opacity-aware coverage contour level q (the ellipse Q(dx) = q with
    sigma = Q/2). Outside it alpha = op*exp(-sigma) < ALPHA_THRESH
    (1/255, ops.rasterize_ref:32) and every compositor SKIPS the pair, so
    binning to this contour instead of the fixed 3-sigma one (q = 9) is
    rendering- and gradient-exact while shedding all pairs a low-opacity
    splat could never touch: q = min(9, 2*ln(op/ALPHA_THRESH)), with
    q <= 0 (op <= 1/255) meaning the splat is entirely invisible.
    gsplat's CUDA binning uses the fixed 3-sigma radius regardless of
    opacity (SURVEY.md C-N1); the extra pairs it keeps are exactly the
    ones its own ALPHA_THRESH test then discards per pixel."""
    return jnp.minimum(2.0 * jnp.log(jnp.maximum(op, 1e-12) * 255.0), 9.0)


def ellipse_row_xrange(conic, xys, ylo, yhi, q=9.0):
    """Pixel-x extent of the q-contour ellipse within the pixel-y band
    [ylo, yhi] — the geometry shared by row-adaptive tile binning
    (ops.tiles.bin_gaussians) and the oracle's per-pixel coverage test
    (ops.rasterize_ref), so the two enumerate IDENTICAL (gaussian, tile)
    pairs. q defaults to the 3-sigma contour (9.0); see coverage_q for
    the opacity-aware level.

    The contour is a*dx^2 + 2b*dx*dy + c*dy^2 = q (conic packs
    (a, b, c), sigma = Q/2). At fixed dy the x-slice is
    (-b*dy +- sqrt(q*a - det*dy^2)) / a; over a band, the upper envelope
    is concave with its max at dy* = -sqrt(q)*b / sqrt(det*c) (where it
    reaches the ellipse's global x-extent sqrt(q*c/det)), so the band
    maximum is the envelope at dy* clamped into the band; the lower
    envelope is the mirror image. conic (..., 3), xys (..., 2), ylo/yhi/q
    broadcastable. Returns (x_lo, x_hi, valid): absolute pixel-x bounds
    and whether the band intersects the ellipse's y-extent at all.
    """
    a = jnp.maximum(conic[..., 0], 1e-12)
    b = conic[..., 1]
    c = jnp.maximum(conic[..., 2], 1e-12)
    q = jnp.maximum(q, 0.0)
    cx_, cy_ = xys[..., 0], xys[..., 1]
    det = jnp.maximum(a * c - b * b, 1e-12)
    dym = jnp.sqrt(q * a / det)
    dlo = jnp.clip(ylo - cy_, -dym, dym)
    dhi = jnp.clip(yhi - cy_, -dym, dym)
    valid = (ylo - cy_ <= dym) & (yhi - cy_ >= -dym) & (q > 0.0)
    dy_v = -jnp.sqrt(q) * b / jnp.sqrt(det * c)

    def slice_x(dy, sign):
        s = jnp.sqrt(jnp.maximum(q * a - det * dy * dy, 0.0))
        return (-b * dy + sign * s) / a

    x_hi = cx_ + slice_x(jnp.clip(dy_v, dlo, dhi), 1.0)
    x_lo = cx_ + slice_x(jnp.clip(-dy_v, dlo, dhi), -1.0)
    return x_lo, x_hi, valid


def row_tile_range(conic, xys, tile_box, ty, tile_size: int, q=9.0):
    """Tile-column range [x0, x1) that the q-contour ellipse covers within
    tile row `ty`, clipped to the gaussian's binned tile box. All args
    broadcast elementwise; returns int32 (x0, x1) with x1 == x0 where the
    row misses the ellipse or the box. THE shared coverage predicate:
    ops.tiles.bin_gaussians enumerates exactly these columns per row and
    ops.rasterize_ref tests pixel tiles against it, so production and
    oracle see identical (gaussian, tile) pair sets."""
    ylo = (ty * tile_size).astype(jnp.float32)
    x_lo, x_hi, bval = ellipse_row_xrange(conic, xys, ylo,
                                          ylo + float(tile_size), q)
    x0b = tile_box[..., 0]
    x1b = tile_box[..., 1]
    y0b = tile_box[..., 2]
    y1b = tile_box[..., 3]
    x0 = jnp.clip(jnp.floor(x_lo / tile_size).astype(jnp.int32), x0b, x1b)
    x1 = jnp.clip(jnp.floor(x_hi / tile_size).astype(jnp.int32) + 1, x0, x1b)
    in_row = bval & (ty >= y0b) & (ty < y1b)
    return x0, jnp.where(in_row, x1, x0)


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
    opacities=None,
) -> Projected:
    """Project N Gaussians into screen space. All args traced except the
    static ints width/height/tile_size.

    `opacities` (optional, (N,) in [0, 1] — the values the compositor
    will receive) tightens the tile box to the opacity-aware coverage
    contour (coverage_q): rendering-exact, fewer (gaussian, tile)
    pairs. Binning must then evaluate row coverage with the same q
    (ops.tiles threads opacity through both its levels)."""
    f32 = jnp.float32
    means = means.astype(f32)
    Rwc = viewmat[:3, :3].astype(f32)
    twc = viewmat[:3, 3].astype(f32)

    # Componentwise view transform ((N,) arrays tile densely on TPU; (N, 3)
    # puts 3 elements on 128 lanes — see _cov3d_components).
    mx, my, mz = means[:, 0], means[:, 1], means[:, 2]
    px_v = Rwc[0, 0] * mx + Rwc[0, 1] * my + Rwc[0, 2] * mz + twc[0]
    py_v = Rwc[1, 0] * mx + Rwc[1, 1] * my + Rwc[1, 2] * mz + twc[1]
    tz = Rwc[2, 0] * mx + Rwc[2, 1] * my + Rwc[2, 2] * mz + twc[2]
    valid = tz > clip_thresh
    # Guard z for the divisions below (invalid entries are masked out at the end).
    tz_safe = jnp.where(valid, tz, 1.0)

    c00, c01, c02, c11, c12, c22 = _cov3d_components(
        scales.astype(f32), quats.astype(f32))

    # FOV-clamped view coordinates feeding the Jacobian (gsplat semantics).
    tan_fovx = 0.5 * width / fx
    tan_fovy = 0.5 * height / fy
    lim_x = 1.3 * tan_fovx
    lim_y = 1.3 * tan_fovy
    tx = jnp.clip(px_v / tz_safe, -lim_x, lim_x) * tz_safe
    ty = jnp.clip(py_v / tz_safe, -lim_y, lim_y) * tz_safe

    rz = 1.0 / tz_safe
    rz2 = rz * rz
    # T = J @ Rwc with J the 2x3 perspective Jacobian at the clamped point;
    # rows expanded componentwise.
    j00 = fx * rz
    j02 = -fx * tx * rz2
    j11 = fy * rz
    j12 = -fy * ty * rz2
    t00 = j00 * Rwc[0, 0] + j02 * Rwc[2, 0]
    t01 = j00 * Rwc[0, 1] + j02 * Rwc[2, 1]
    t02 = j00 * Rwc[0, 2] + j02 * Rwc[2, 2]
    t10 = j11 * Rwc[1, 0] + j12 * Rwc[2, 0]
    t11 = j11 * Rwc[1, 1] + j12 * Rwc[2, 1]
    t12 = j11 * Rwc[1, 2] + j12 * Rwc[2, 2]

    # cov2d = T cov3d T^T (cov3d symmetric, upper-tri components).
    # u_i = (T cov3d)_0i ; v_i = (T cov3d)_1i
    u0 = t00 * c00 + t01 * c01 + t02 * c02
    u1 = t00 * c01 + t01 * c11 + t02 * c12
    u2 = t00 * c02 + t01 * c12 + t02 * c22
    v0 = t10 * c00 + t11 * c01 + t12 * c02
    v1 = t10 * c01 + t11 * c11 + t12 * c12
    v2 = t10 * c02 + t11 * c12 + t12 * c22
    a = u0 * t00 + u1 * t01 + u2 * t02
    b = u0 * t10 + u1 * t11 + u2 * t12
    c = v0 * t10 + v1 * t11 + v2 * t12
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
    # Tile bounds use the exact AABB of the coverage ELLIPSE (marginal
    # stddevs sqrt(a), sqrt(c)) instead of gsplat's 3-sigma-circle square —
    # every point outside it has alpha below the compositor's skip
    # threshold, so for anisotropic splats this sheds ~2x of the
    # (gaussian, tile) pairs with zero rendering difference. With
    # opacities given the contour tightens further (coverage_q).
    qv = coverage_q(opacities) if opacities is not None else 9.0
    rx_f = jnp.ceil(jnp.sqrt(jnp.maximum(qv * a, 1e-8)))
    ry_f = jnp.ceil(jnp.sqrt(jnp.maximum(qv * c, 1e-8)))

    center_x = fx * px_v * rz + cx
    center_y = fy * py_v * rz + cy
    xys = jnp.stack([center_x, center_y], axis=-1)

    # Tile bounds [x0, x1) x [y0, y1), clamped to the grid.
    ntx = (width + tile_size - 1) // tile_size
    nty = (height + tile_size - 1) // tile_size
    rx = jax.lax.stop_gradient(rx_f)
    ry = jax.lax.stop_gradient(ry_f)
    cxp = jax.lax.stop_gradient(center_x)
    cyp = jax.lax.stop_gradient(center_y)
    x0 = jnp.clip(jnp.floor((cxp - rx) / tile_size), 0, ntx).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((cyp - ry) / tile_size), 0, nty).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((cxp + rx) / tile_size) + 1, 0, ntx).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((cyp + ry) / tile_size) + 1, 0, nty).astype(jnp.int32)

    visible = valid & det_ok
    if opacities is not None:
        visible = visible & (qv > 0.0)   # op <= 1/255: never composited
    # radii keeps the plain 3-sigma eigenvalue radius regardless of
    # opacity: it feeds the densifier's screen-size stats
    # (sgn_splatfacto.py:534-541), which the reference computes that way.
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
