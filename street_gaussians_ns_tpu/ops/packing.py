"""bf16-pair packing: ride two feature columns in one int32 sort payload.

`lax.sort` cost on TPU scales with operand COUNT (~0.8 ms per operand per
M elements, tools/bench_scatter.py) — the pair sort is the single most
expensive op of the render step. Packing two bf16 halves into one int32
halves the payload count for columns that tolerate 2^-8 relative rounding
(conics, opacity, colors — NOT screen-space xy, whose rounding would move
splat centers by up to several pixels for large splats).

The same trick the gradient reduce uses (ops.composite_pallas
GRAD_PACK_BF16); factored here so the binning sorts can share it.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def pack2(a: jax.Array, b: jax.Array) -> jax.Array:
    """Two f32 arrays -> one int32 array of bf16 halves (a in the high
    16 bits). Values round to bf16 (~2^-8 relative)."""
    ua = jax.lax.bitcast_convert_type(a.astype(jnp.bfloat16),
                                      jnp.uint16).astype(jnp.uint32)
    ub = jax.lax.bitcast_convert_type(b.astype(jnp.bfloat16),
                                      jnp.uint16).astype(jnp.uint32)
    return ((ua << 16) | ub).astype(jnp.int32)


def unpack2(p: jax.Array):
    """Inverse of pack2: int32 -> (a, b) as f32 (bf16-rounded values)."""
    u = p.astype(jnp.uint32)

    def half(h):
        return jax.lax.bitcast_convert_type(
            h.astype(jnp.uint16), jnp.bfloat16).astype(jnp.float32)

    return half(u >> 16), half(u & 0xFFFF)
