"""Camera pose optimizer (mode "off" in the shipped config, sgn_config.py:44,
but the machinery exists — nerfstudio CameraOptimizer instantiated at
sgn_splatfacto.py:306-308). Learnable per-camera SE(3)/SO(3)xR3 deltas
applied to c2w; the exp maps are the standard Lie-group formulas
(nerfstudio cameras/lie_groups.py equivalents, reimplemented)."""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CameraOptConfig:
    mode: str = "off"          # "off" | "SO3xR3" | "SE3"
    num_cameras: int = 0


def init_camera_opt(config: CameraOptConfig) -> Optional[jax.Array]:
    if config.mode == "off" or config.num_cameras == 0:
        return None
    return jnp.zeros((config.num_cameras, 6), jnp.float32)


def _skew(v):
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack([
        jnp.stack([z, -v[..., 2], v[..., 1]], -1),
        jnp.stack([v[..., 2], z, -v[..., 0]], -1),
        jnp.stack([-v[..., 1], v[..., 0], z], -1),
    ], -2)


def exp_map_SO3xR3(tangent: jax.Array) -> jax.Array:
    """(..., 6) [t, omega] -> (..., 3, 4): R = exp(omega), T = t.

    Double-where around the norm: the small-angle branch must never see
    sqrt(0) — its NaN gradient would leak through the outer select
    (cotangents of a where's discarded branch are 0 * NaN = NaN)."""
    t = tangent[..., :3]
    omega = tangent[..., 3:]
    sq = jnp.sum(omega * omega, axis=-1, keepdims=True)
    small = sq < 1e-12
    theta = jnp.sqrt(jnp.where(small, 1.0, sq))
    K = _skew(omega / theta)
    th = theta[..., None]
    R = (jnp.eye(3) + jnp.sin(th) * K + (1 - jnp.cos(th)) * (K @ K))
    R = jnp.where(small[..., None], jnp.eye(3) + _skew(omega), R)
    return jnp.concatenate([R, t[..., None]], axis=-1)


def exp_map_SE3(tangent: jax.Array) -> jax.Array:
    """(..., 6) [rho, omega] -> (..., 3, 4) full SE(3) exponential.
    Same safe-norm double-where as exp_map_SO3xR3."""
    rho = tangent[..., :3]
    omega = tangent[..., 3:]
    sq = jnp.sum(omega * omega, axis=-1, keepdims=True)
    small = sq < 1e-12
    theta = jnp.sqrt(jnp.where(small, 1.0, sq))
    K = _skew(omega / theta)
    th = theta[..., None]
    R = jnp.eye(3) + jnp.sin(th) * K + (1 - jnp.cos(th)) * (K @ K)
    V = (jnp.eye(3) + (1 - jnp.cos(th)) / th * K
         + (th - jnp.sin(th)) / th * (K @ K))
    small_m = small[..., None]
    R = jnp.where(small_m, jnp.eye(3) + _skew(omega), R)
    V = jnp.where(small_m, jnp.eye(3), V)
    return jnp.concatenate([R, (V @ rho[..., None])], axis=-1)


def apply_camera_opt(config: CameraOptConfig,
                     adjustment: Optional[jax.Array],
                     camera_idx: jax.Array,
                     c2w: jax.Array) -> jax.Array:
    """Compose the learned per-camera delta with c2w (3, 4)."""
    if config.mode == "off" or adjustment is None:
        return c2w
    tangent = adjustment[camera_idx]
    delta = (exp_map_SO3xR3(tangent) if config.mode == "SO3xR3"
             else exp_map_SE3(tangent))
    R = delta[..., :3, :3] @ c2w[:3, :3]
    t = delta[..., :3, :3] @ c2w[:3, 3:4] + delta[..., :3, 3:4]
    return jnp.concatenate([R, t], axis=-1)
