"""Unit tests for ops.expand_pallas (ragged expansion / monotone pick).

Interpret-mode Pallas vs the pure-jnp fallback on random ragged layouts,
including the boundary cases the binning pipeline produces: zero-count
runs interleaved (clipped tile rows), trailing sentinel runs (invisible
gaussians), out-of-range queries.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from street_gaussians_ns_tpu.ops.expand_pallas import (
    EXPAND_MARGIN, expand_ragged)


def _ragged(rng, n_src, c, p_zero=0.1, max_count=7):
    counts = rng.integers(1, max_count, size=n_src)
    counts[rng.random(n_src) < p_zero] = 0
    ends = np.cumsum(counts).astype(np.int32)
    starts = (ends - counts).astype(np.int32)
    src = rng.standard_normal((c, n_src)).astype(np.float32)
    return src, starts, ends, int(ends[-1])


def _expand_oracle(src, starts, ends, out_len):
    c = src.shape[0]
    out = np.zeros((c, out_len), np.float32)
    for i in range(src.shape[1]):
        out[:, starts[i]:ends[i]] = src[:, i:i + 1]
    return out


@pytest.mark.parametrize("n_src,out_len", [(300, 1200), (50, 4000)])
def test_expand_ragged_interpret(n_src, out_len):
    rng = np.random.default_rng(0)
    src, starts, ends, total = _ragged(rng, n_src, 5)
    out = expand_ragged(jnp.asarray(src), jnp.asarray(starts),
                        jnp.asarray(ends), out_len, interpret=True)
    ref = _expand_oracle(src, starts, ends, out_len)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_expand_ragged_zero_margin_overflow_is_zero():
    # More consecutive zero-count runs than the margin: the overflowed
    # slots must come out zero (inert), not garbage.
    n_src = 2 * EXPAND_MARGIN + 64
    counts = np.zeros(n_src, np.int32)
    counts[0] = 3
    counts[-1] = 5
    ends = np.cumsum(counts).astype(np.int32)
    starts = (ends - counts).astype(np.int32)
    src = np.arange(n_src, dtype=np.float32)[None] + 1.0
    out = np.asarray(expand_ragged(jnp.asarray(src), jnp.asarray(starts),
                                   jnp.asarray(ends), 8, interpret=True))
    # slots 0..2 from run 0 always in-window.
    np.testing.assert_array_equal(out[0, :3], src[0, 0].repeat(3))
    # slots 3..7 belong to the last run, beyond the window: zero or correct.
    ok = (out[0, 3:] == 0.0) | (out[0, 3:] == src[0, -1])
    assert ok.all()
