"""Pallas TPU block-scan primitives: row-wise cumulative sum over tall
matrices.

XLA's cumsum over an (8M, 16) array runs as ~log(n) full-array passes
(~150 ms measured on v5e); a sequential block scan is one pass at HBM
bandwidth (~5 ms): grid over row blocks (Pallas TPU grids execute in
order on the core), each block does an in-VMEM log-step inclusive scan
and adds the running carry kept in scratch (scratch persists across grid
steps).

Used by composite_pallas._reduce_pair_grads (the reduceat that turns
per-pair gradients into per-gaussian sums).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 2048


def _cumsum_block(x):
    """Inclusive cumsum along axis 0 of a (B, C) block via log-step
    roll/add (Hillis-Steele; no cumsum lowering on TPU Pallas)."""
    b = x.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    s = 1
    while s < b:
        x = x + jnp.where(rows >= s, pltpu.roll(x, s, axis=0),
                          jnp.zeros_like(x))
        s *= 2
    return x


def _cumsum_kernel(x_ref, out_ref, carry):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry[:, :] = jnp.zeros_like(carry)

    block = _cumsum_block(x_ref[0])
    out = block + carry[:, :]
    out_ref[0] = out
    carry[:, :] = out[-1:, :]


def cumsum_rows(x: jax.Array, interpret: bool = False) -> jax.Array:
    """Inclusive cumulative sum along axis 0 of (M, C) f32, M % BLOCK == 0
    (callers pad; trailing zero rows keep the prefix exact)."""
    m, c = x.shape
    pad = (-m) % BLOCK
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    mp = m + pad
    out = pl.pallas_call(
        _cumsum_kernel,
        grid=(mp // BLOCK,),
        in_specs=[pl.BlockSpec((1, BLOCK, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, BLOCK, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp // BLOCK, BLOCK, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, c), jnp.float32)],
        interpret=interpret,
    )(x.reshape(mp // BLOCK, BLOCK, c))
    return out.reshape(mp, c)[:m]
