"""Time-Fourier (4D) diffuse color features.

The scene graph gives each object's SH-DC coefficient a small Fourier basis
over normalized track time, so vehicle appearance can vary per frame
(reference IDFT + get_fourier_features,
/root/reference/street_gaussians_ns/sgn_splatfacto_scene_graph.py:239-247,
420-433). dim=1 degenerates to a constant (the background's static DC).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def idft_basis(t: jax.Array, dim: int) -> jax.Array:
    """IDFT row for scalar (or batched) time t: (..., dim).

    Even index k -> cos(t * k * 2pi / dim); odd index k -> sin(t * (k+1) *
    2pi / dim) — exactly the reference's IDFT (scene_graph:420-433).
    """
    t = jnp.asarray(t, jnp.float32)[..., None]
    k = jnp.arange(dim, dtype=jnp.float32)
    is_even = (jnp.arange(dim) % 2) == 0
    ang_even = t * k * (2.0 * jnp.pi / dim)
    ang_odd = t * (k + 1.0) * (2.0 * jnp.pi / dim)
    return jnp.where(is_even, jnp.cos(ang_even), jnp.sin(ang_odd))


def fourier_dc(features_dc: jax.Array, t: jax.Array) -> jax.Array:
    """Collapse (N, F, 3) Fourier coefficients at time t -> (N, 3) SH DC.

    Matches get_fourier_features: sum_k dc[:, k, :] * IDFT(t)[k]. For F=1
    this is the identity (IDFT(., 1) = cos(0) = 1).
    """
    dim = features_dc.shape[1]
    basis = idft_basis(t, dim)                     # (dim,)
    return jnp.einsum("nfc,f->nc", features_dc, basis)
