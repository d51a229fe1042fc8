"""Geometric eval: LiDAR-vs-Gaussian chamfer distance.

Native equivalent of data/utils/geometric_metric.py (C11): transform the
aggregated LiDAR cloud into model space (GL<->CV swap + dataparser
transform/scale, :90-92) and report the symmetric chamfer distance between
it and the Gaussian means, in units of 1e-4 (CD_UNIT, :5).

Nearest-neighbor queries run as a chunked (N, M) distance sweep under jit
— MXU-shaped (x.y via matmul) and memory-bounded by the chunk size.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

CD_UNIT = 1e-4


def _min_sqdist(a: jax.Array, b: jax.Array, chunk: int = 4096) -> jax.Array:
    """min_j ||a_i - b_j||^2 for each i. a (N,3), b (M,3).

    The MXU-friendly |a|^2 - 2ab + |b|^2 sweep only selects the argmin
    (robust to its f32 cancellation); the returned distance is recomputed
    exactly against the selected neighbor."""
    b_sq = jnp.sum(b * b, axis=1)

    def body(carry, a_chunk):
        d = (jnp.sum(a_chunk * a_chunk, 1)[:, None]
             - 2.0 * a_chunk @ b.T + b_sq[None, :])
        j = jnp.argmin(d, axis=1)
        exact = jnp.sum((a_chunk - b[j]) ** 2, axis=1)
        return carry, exact

    n = a.shape[0]
    pad = (-n) % chunk
    a_pad = jnp.pad(a, ((0, pad), (0, 0)))
    _, mins = jax.lax.scan(body, None, a_pad.reshape(-1, chunk, 3))
    return mins.reshape(-1)[:n]


def chamfer_distance(a: jax.Array, b: jax.Array) -> jax.Array:
    """Symmetric chamfer (mean of mean sqrt-squared distances), in CD_UNIT
    (calc_chamfer_distance, geometric_metric.py:59-69)."""
    d_ab = jnp.sqrt(jnp.maximum(_min_sqdist(a, b), 0.0)).mean()
    d_ba = jnp.sqrt(jnp.maximum(_min_sqdist(b, a), 0.0)).mean()
    return (d_ab + d_ba) * 0.5 / CD_UNIT


def chamfer_directed(a: jax.Array, b: jax.Array):
    """One-directional means (d_ab, d_ba) in CD_UNIT — the reference
    reports both directions plus their average
    (geometric_metric.py:59-70, :100)."""
    d_ab = jnp.sqrt(jnp.maximum(_min_sqdist(a, b), 0.0)).mean() / CD_UNIT
    d_ba = jnp.sqrt(jnp.maximum(_min_sqdist(b, a), 0.0)).mean() / CD_UNIT
    return d_ab, d_ba


def gl2cv_points(pts: np.ndarray) -> np.ndarray:
    """(x,y,z) OpenGL -> OpenCV world swap (geometric_metric.py:8-16)."""
    out = pts[:, [1, 0, 2]].copy()
    out[:, 2] *= -1
    return out


def evaluate_lidar_geometric(
    means: np.ndarray,              # (N, 3) active gaussian means
    lidar_points: np.ndarray,       # (M, 3) aggregated lidar, raw clip frame
    transform_matrix: np.ndarray,   # (3, 4) dataparser transform
    scale: float,
    applied_translation: np.ndarray | None = None,  # colmap-frame shift
    max_points: int = 200_000,
) -> dict:
    """Chamfer between the model's means and the clip's LiDAR transformed
    into model space (evaluate_lidar_geometric, :72-100): LiDAR gets the
    gl2cv'd -0.98*T0 colmap shift (:83-87), then the dataparser world
    transform + scale (:88-92). Returns the reference's three keys
    (lidar_chamfer_distance_{1,2,avg}, :100) in CD_UNIT."""
    rng = np.random.RandomState(0)
    if len(lidar_points) > max_points:
        lidar_points = lidar_points[rng.choice(len(lidar_points), max_points,
                                               replace=False)]
    if len(means) > max_points:
        means = means[rng.choice(len(means), max_points, replace=False)]
    pts = np.asarray(lidar_points, np.float64)
    if applied_translation is not None:
        pts = pts + np.asarray(applied_translation)[None, :]
    t44 = np.concatenate([transform_matrix, [[0, 0, 0, 1]]], axis=0)
    pts = np.concatenate([pts, np.ones((len(pts), 1))], 1)
    pts = (pts @ t44.T)[:, :3] * scale
    d1, d2 = chamfer_directed(jnp.asarray(means, jnp.float32),
                              jnp.asarray(pts, jnp.float32))
    d1, d2 = float(d1), float(d2)
    return {"lidar_chamfer_distance_1": d1,
            "lidar_chamfer_distance_2": d2,
            "lidar_chamfer_distance_avg": 0.5 * (d1 + d2)}
