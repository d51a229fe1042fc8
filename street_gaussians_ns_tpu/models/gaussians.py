"""Fixed-capacity Gaussian parameter store.

The reference grows/shrinks torch tensors on every densify/cull and
surgically rewrites Adam state (sgn_splatfacto.py:459-511, 550-720). Under
XLA that reallocation dance would recompile every refinement; instead
params live in preallocated (CAP, ...) buffers with an `active` mask.
Densify/cull become masked scatters (models.refinement), checkpoints are
shape-stable, and the whole store shards cleanly over a device mesh.

Parameterization matches the reference exactly (sgn_splatfacto.py:253-331):
  means raw, scales log (exp activation), quats raw wxyz (normalized at
  projection), opacities logit (sigmoid), features_dc (CAP, F, 3) raw SH-DC
  Fourier coefficients (F=1 background / static, F=5 objects), features_rest
  (CAP, K-1, 3) higher SH bands.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core import quaternions as quat
from ..core.sh import num_sh_bases, rgb2sh


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianParams:
    """The optimizable per-gaussian parameters (each (CAP, ...))."""

    means: jax.Array          # (CAP, 3)
    scales: jax.Array         # (CAP, 3) log-scale
    quats: jax.Array          # (CAP, 4) wxyz
    features_dc: jax.Array    # (CAP, F, 3) Fourier SH-DC coefficients
    features_rest: jax.Array  # (CAP, K-1, 3)
    opacities: jax.Array      # (CAP, 1) logit

    @property
    def capacity(self) -> int:
        return self.means.shape[0]

    def as_dict(self):
        return {f.name: getattr(self, f.name) for f in dataclasses.fields(self)}


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianStore:
    """Params + activity mask + densification statistics."""

    params: GaussianParams
    active: jax.Array           # (CAP,) bool
    # Densification stats, reset every refinement (sgn_splatfacto.py:513-541).
    xys_grad_norm: jax.Array    # (CAP,) accumulated ||dL/dxys||
    vis_counts: jax.Array       # (CAP,) number of steps each gaussian was visible
    max_2dsize: jax.Array       # (CAP,) max radii / max(H, W) seen

    @property
    def capacity(self) -> int:
        return self.params.capacity

    @property
    def num_active(self) -> jax.Array:
        return jnp.sum(self.active.astype(jnp.int32))


def zeros_stats(cap: int):
    return (jnp.zeros((cap,), jnp.float32), jnp.zeros((cap,), jnp.float32),
            jnp.zeros((cap,), jnp.float32))


def knn_avg_dist(points: np.ndarray, k: int = 3) -> np.ndarray:
    """Mean distance to the k nearest neighbors (excluding self) — the
    reference's scale init (k_nearest_sklearn, sgn_splatfacto.py:260-264,
    439-455). Host-side numpy: init is offline."""
    from scipy.spatial import cKDTree

    tree = cKDTree(points)
    d, _ = tree.query(points, k=k + 1)
    return d[:, 1:].mean(axis=1).astype(np.float32)


def init_gaussians(
    capacity: int,
    seed_points: np.ndarray | None,       # (N, 3) float
    seed_colors: np.ndarray | None,       # (N, 3) uint8/float in [0, 255]
    *,
    sh_degree: int = 3,
    fourier_dim: int = 1,
    num_random: int = 50000,
    random_scale: float = 10.0,
    rng: jax.Array | None = None,
) -> GaussianStore:
    """Build a store from SfM/LiDAR seeds or random init, zero-padded to CAP.

    Mirrors SplatfactoModel.populate_modules (sgn_splatfacto.py:253-331):
    kNN-averaged log scales, Shoemake random quats, logit(0.1) opacities,
    RGB2SH seed colors into Fourier row 0 (random init uses raw U[0,1] DC).
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    k_means, k_quat, k_dc = jax.random.split(rng, 3)
    dim_sh = num_sh_bases(sh_degree)

    if seed_points is not None:
        pts = np.asarray(seed_points, np.float32)
        n = pts.shape[0]
        if n > capacity:
            keep = np.random.RandomState(0).choice(n, capacity, replace=False)
            pts = pts[keep]
            seed_colors = None if seed_colors is None else np.asarray(seed_colors)[keep]
            n = capacity
        means = jnp.zeros((capacity, 3), jnp.float32).at[:n].set(pts)
        avg = knn_avg_dist(pts) if n > 1 else np.ones((n,), np.float32)
        log_scales = np.log(np.maximum(avg, 1e-7))
        scales = jnp.zeros((capacity, 3), jnp.float32).at[:n].set(
            jnp.asarray(log_scales)[:, None].repeat(3, axis=1))
        features_dc = jnp.zeros((capacity, fourier_dim, 3), jnp.float32)
        if seed_colors is not None:
            cols = jnp.asarray(np.asarray(seed_colors, np.float32) / 255.0)
            features_dc = features_dc.at[:n, 0, :].set(rgb2sh(cols))
    else:
        n = min(num_random, capacity)
        means = jnp.zeros((capacity, 3), jnp.float32).at[:n].set(
            (jax.random.uniform(k_means, (n, 3)) - 0.5) * random_scale)
        # Random init has no geometry for kNN; the reference still runs kNN
        # over the random cloud — reproduce on host.
        pts = np.asarray(means[:n])
        avg = knn_avg_dist(pts) if n > 1 else np.ones((n,), np.float32)
        scales = jnp.zeros((capacity, 3), jnp.float32).at[:n].set(
            jnp.asarray(np.log(np.maximum(avg, 1e-7)))[:, None].repeat(3, axis=1))
        features_dc = jnp.zeros((capacity, fourier_dim, 3), jnp.float32)
        features_dc = features_dc.at[:n, 0, :].set(
            jax.random.uniform(k_dc, (n, 3)))

    quats = jnp.zeros((capacity, 4), jnp.float32).at[:, 0].set(1.0)
    quats = quats.at[:n].set(quat.random_quats(k_quat, n))
    opacities = jnp.full((capacity, 1), _logit(0.1), jnp.float32)
    features_rest = jnp.zeros((capacity, dim_sh - 1, 3), jnp.float32)
    active = jnp.zeros((capacity,), bool).at[:n].set(True)

    params = GaussianParams(
        means=means, scales=scales, quats=quats, features_dc=features_dc,
        features_rest=features_rest, opacities=opacities,
    )
    g, v, m = zeros_stats(capacity)
    return GaussianStore(params=params, active=active, xys_grad_norm=g,
                         vis_counts=v, max_2dsize=m)


def _logit(x: float) -> float:
    return float(np.log(x / (1.0 - x)))


def activated_opacities(params: GaussianParams, active: jax.Array) -> jax.Array:
    """(CAP,) sigmoid opacities, zeroed for inactive slots (an inactive
    gaussian renders as fully transparent and is skipped by the alpha
    threshold; its tile pairs are also masked out at projection)."""
    return jnp.where(active, jax.nn.sigmoid(params.opacities[:, 0]), 0.0)


def activated_scales(params: GaussianParams) -> jax.Array:
    return jnp.exp(params.scales)
