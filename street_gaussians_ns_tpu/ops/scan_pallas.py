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
FLAT_ROWS = 512                  # sublanes per flat-scan block
FLAT_BLOCK = FLAT_ROWS * 128     # elements per flat-scan block


def _flat_identity(dtype, op):
    if op == "add":
        return 0
    return jnp.iinfo(jnp.int32).min if dtype == jnp.int32 else -jnp.inf


def _flat_scan_kernel(x_ref, out_ref, carry, *, op: str):
    """One (FLAT_ROWS, 128) block of a flat scan over row-major elements:
    lane log-scan, then a sublane log-scan of the lane tails broadcast back
    exclusively, then the cross-block carry (scratch persists across the
    sequential grid). ~16 vector ops per block vs. the 2-wide-lane layout
    of the row-wise kernel below (this is the one to use for (M,) data)."""
    i = pl.program_id(0)
    x = x_ref[0]
    ident = _flat_identity(x.dtype, op)
    combine = jnp.add if op == "add" else jnp.maximum

    @pl.when(i == 0)
    def _():
        carry[:, :] = jnp.full_like(carry, ident)

    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = 1
    while s < 128:
        x = combine(x, jnp.where(cols >= s, pltpu.roll(x, s, axis=1),
                                 ident))
        s *= 2
    # Scan the per-row tails down the sublanes, exclusively.
    t = x[:, 127:128]                                   # (R, 1) inclusive
    rows = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
    s = 1
    while s < FLAT_ROWS:
        t = combine(t, jnp.where(rows >= s, pltpu.roll(t, s, axis=0),
                                 ident))
        s *= 2
    excl = jnp.where(rows >= 1, pltpu.roll(t, 1, axis=0),
                     jnp.full_like(t, ident))
    x = combine(x, excl)
    x = combine(x, carry[:, :])
    out_ref[0] = x
    carry[:, :] = x[-1:, 127:128]


def _scan_flat(x: jax.Array, op: str, interpret: bool = False) -> jax.Array:
    """Inclusive scan over a flat (M,) array, one pass at HBM speed."""
    (m,) = x.shape
    pad = (-m) % FLAT_BLOCK
    if pad:
        x = jnp.pad(x, (0, pad), constant_values=_flat_identity(x.dtype, op))
    nb = (m + pad) // FLAT_BLOCK
    out = pl.pallas_call(
        functools.partial(_flat_scan_kernel, op=op),
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, FLAT_ROWS, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, FLAT_ROWS, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, FLAT_ROWS, 128), x.dtype),
        scratch_shapes=[pltpu.VMEM((1, 1), x.dtype)],
        interpret=interpret,
    )(x.reshape(nb, FLAT_ROWS, 128))
    return out.reshape(-1)[:m]


def cumsum_flat(x: jax.Array, interpret: bool = False) -> jax.Array:
    """Inclusive cumsum of a flat (M,) array; jnp off-TPU."""
    if not interpret and jax.default_backend() != "tpu":
        return jnp.cumsum(x)
    return _scan_flat(x, "add", interpret)


def cummax_flat(x: jax.Array, interpret: bool = False) -> jax.Array:
    """Inclusive cummax of a flat (M,) array; jnp off-TPU."""
    if not interpret and jax.default_backend() != "tpu":
        return jax.lax.cummax(x, axis=0)
    return _scan_flat(x, "max", interpret)


def _scan_block(x, op):
    """Inclusive scan along axis 0 of a (B, C) block via log-step
    roll/combine (Hillis-Steele; no scan lowering on TPU Pallas)."""
    b = x.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    if op == "add":
        identity = jnp.zeros_like(x)
        combine = jnp.add
    else:
        identity = jnp.full_like(x, jnp.iinfo(jnp.int32).min
                                 if x.dtype == jnp.int32 else -jnp.inf)
        combine = jnp.maximum
    s = 1
    while s < b:
        x = combine(x, jnp.where(rows >= s, pltpu.roll(x, s, axis=0),
                                 identity))
        s *= 2
    return x


def _scan_kernel(x_ref, out_ref, carry, *, op: str):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        if op == "add":
            carry[:, :] = jnp.zeros_like(carry)
        else:
            carry[:, :] = jnp.full_like(
                carry, jnp.iinfo(jnp.int32).min
                if carry.dtype == jnp.int32 else -jnp.inf)

    block = _scan_block(x_ref[0], op)
    if op == "add":
        out = block + carry[:, :]
    else:
        out = jnp.maximum(block, carry[:, :])
    out_ref[0] = out
    carry[:, :] = out[-1:, :]


def _scan_rows(x: jax.Array, op: str, interpret: bool = False) -> jax.Array:
    m, c = x.shape
    pad = (-m) % BLOCK
    if pad:
        fill = 0 if op == "add" else (jnp.iinfo(jnp.int32).min
                                      if x.dtype == jnp.int32 else -jnp.inf)
        x = jnp.pad(x, ((0, pad), (0, 0)), constant_values=fill)
    mp = m + pad
    out = pl.pallas_call(
        functools.partial(_scan_kernel, op=op),
        grid=(mp // BLOCK,),
        in_specs=[pl.BlockSpec((1, BLOCK, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, BLOCK, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp // BLOCK, BLOCK, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((1, c), x.dtype)],
        interpret=interpret,
    )(x.reshape(mp // BLOCK, BLOCK, c))
    return out.reshape(mp, c)[:m]


def cumsum_rows(x: jax.Array, interpret: bool = False) -> jax.Array:
    """Inclusive cumulative sum along axis 0 of (M, C). Non-TPU backends
    use jnp (the kernel is exercised via interpret=True in tests)."""
    if not interpret and jax.default_backend() != "tpu":
        return jnp.cumsum(x, axis=0)
    return _scan_rows(x, "add", interpret)


def cummax_rows(x: jax.Array, interpret: bool = False) -> jax.Array:
    """Inclusive cumulative max along axis 0 of (M, C); jnp off-TPU."""
    if not interpret and jax.default_backend() != "tpu":
        return jax.lax.cummax(x, axis=0)
    return _scan_rows(x, "max", interpret)
