"""Camera container + pose conventions.

The reference stores camera-to-world in the OpenGL/nerfstudio convention
(x right, y up, camera looks along -z) and converts to the rasterizer's
convention (+z forward, y down) by right-multiplying R with diag(1,-1,-1)
before inverting (sgn_splatfacto.py:825-836). We reproduce exactly that
conversion here so poses loaded from the same COLMAP/transform.json data
render identically.

Camera is a registered pytree so it can be passed through jit boundaries;
static fields (resolution) are python ints — one compile per resolution,
which is the natural XLA contract (whole-image rendering has static shape).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

# Camera model identifiers matching the reference's supported undistortion
# paths: PERSPECTIVE / FISHEYE / FISHEYE624 (sgn_datamanager.py:326-497).
# FISHEYE624 frames are undistorted to pinhole at cache time
# (data/fisheye624.py), so the render path only ever sees PERSPECTIVE.
PERSPECTIVE = 0
FISHEYE = 1
FISHEYE624 = 2


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """A single pinhole camera (post-undistortion) with an optional timestamp.

    Attributes:
        fx, fy, cx, cy: intrinsics in pixels (scalar arrays, traced).
        c2w: (3, 4) camera-to-world, OpenGL convention (look along -z).
        time: scalar float timestamp in [0, 1] or raw seconds; used by the
            scene graph to look up object boxes (scene_graph:326).
        width, height: static python ints (pixel resolution).
    """

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    c2w: jax.Array
    time: jax.Array
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))

    @staticmethod
    def make(fx, fy, cx, cy, c2w, width: int, height: int, time=0.0) -> "Camera":
        return Camera(
            fx=jnp.asarray(fx, jnp.float32),
            fy=jnp.asarray(fy, jnp.float32),
            cx=jnp.asarray(cx, jnp.float32),
            cy=jnp.asarray(cy, jnp.float32),
            c2w=jnp.asarray(c2w, jnp.float32)[:3, :4],
            time=jnp.asarray(time, jnp.float32),
            width=int(width),
            height=int(height),
        )

    def rescaled(self, scale: float) -> "Camera":
        """Scale output resolution (reference: rescale_output_resolution,
        used for the train-time downscale schedule, sgn_splatfacto.py:823)."""
        return Camera(
            fx=self.fx * scale,
            fy=self.fy * scale,
            cx=self.cx * scale,
            cy=self.cy * scale,
            c2w=self.c2w,
            time=self.time,
            width=int(round(self.width * scale)),
            height=int(round(self.height * scale)),
        )


def viewmat_from_c2w(c2w: jax.Array) -> jax.Array:
    """OpenGL c2w (3,4) -> world-to-camera (4,4) in rasterizer convention.

    Flips y/z axes (R_edit = diag(1,-1,-1)) then inverts analytically,
    mirroring sgn_splatfacto.py:825-836.
    """
    R = c2w[:3, :3]
    T = c2w[:3, 3:4]
    R = R * jnp.asarray([1.0, -1.0, -1.0])[None, :]  # R @ diag(1,-1,-1)
    R_inv = R.T
    T_inv = -R_inv @ T
    viewmat = jnp.eye(4, dtype=c2w.dtype)
    viewmat = viewmat.at[:3, :3].set(R_inv)
    viewmat = viewmat.at[:3, 3:4].set(T_inv)
    return viewmat


def pixel_directions(camera: Camera, jitter_key: Optional[jax.Array] = None,
                     row0=0, rows: Optional[int] = None) -> jax.Array:
    """Per-pixel world ray directions (rows, W, 3), normalized.

    Matches EnvLight.get_world_directions (sgn_splatfacto.py:118-137):
    dirs_cam = ((u - cx + du)/fx, (v - cy + dv)/fy, 1), normalized, then
    rotated by c2w R. At train time du,dv ~ U[0,1) (anti-alias jitter);
    at eval du=dv=0.5 (pixel centers).

    row0/rows select a horizontal band of pixel rows (static `rows`,
    possibly traced `row0`) — the model-sharded sky path computes each
    column's band and all_gathers (parallel.sharded). The jitter draw is
    generated for the FULL frame and sliced, so a banded render composes
    to exactly the full-frame render for the same key.
    """
    H, W = camera.height, camera.width
    if rows is None:
        rows = H
    row0 = jnp.asarray(row0, jnp.int32)
    u = jnp.arange(W, dtype=jnp.float32)[None, :].repeat(rows, axis=0)
    v = (jnp.arange(rows, dtype=jnp.float32)
         + row0.astype(jnp.float32))[:, None].repeat(W, axis=1)
    if jitter_key is not None:
        du = jax.random.uniform(jitter_key, (2, H, W), jnp.float32)
        if rows != H:
            # Zero-pad so the last (grid-padding) band slices cleanly —
            # its rows land past H and are cropped by the caller.
            du = jnp.pad(du, ((0, 0), (0, rows), (0, 0)))
            du = jax.lax.dynamic_slice(du, (0, row0, 0), (2, rows, W))
        u = u + du[0]
        v = v + du[1]
    else:
        u = u + 0.5
        v = v + 0.5
    d = jnp.stack(
        [(u - camera.cx) / camera.fx, (v - camera.cy) / camera.fy, jnp.ones_like(u)],
        axis=-1,
    )
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    # nerfstudio c2w is OpenGL (-z forward): the reference builds dirs with
    # +z forward in the *camera* frame and rotates by the raw OpenGL R —
    # reproduce as-is (sgn_splatfacto.py:128-136 uses c2w[:3,:3] @ dirs with
    # z=+1, which bakes in their sky orientation convention).
    return jnp.einsum("ij,hwj->hwi", camera.c2w[:3, :3], d)
