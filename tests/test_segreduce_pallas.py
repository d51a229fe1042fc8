"""Unit tests for ops.segreduce_pallas.segment_rowsum (interpret-mode
Pallas vs a numpy oracle) on ragged segment layouts including empty
segments and truncated (clipped) tails."""
import jax.numpy as jnp
import numpy as np
import pytest

from street_gaussians_ns_tpu.ops.segreduce_pallas import segment_rowsum


def _segments(rng, n_seg, p_empty=0.15, max_count=9):
    counts = rng.integers(1, max_count, size=n_seg)
    counts[rng.random(n_seg) < p_empty] = 0
    ends = np.cumsum(counts).astype(np.int32)
    starts = (ends - counts).astype(np.int32)
    return starts, ends, int(ends[-1])


@pytest.mark.parametrize("seed,n_seg,c", [(0, 500, 4), (1, 2500, 16)])
def test_matches_oracle(seed, n_seg, c):
    rng = np.random.default_rng(seed)
    starts, ends, total = _segments(rng, n_seg)
    rows = rng.standard_normal((c, total)).astype(np.float32)
    out = segment_rowsum(jnp.asarray(rows), jnp.asarray(starts),
                         jnp.asarray(ends), interpret=True)
    ref = np.zeros((c, n_seg), np.float32)
    for i in range(n_seg):
        ref[:, i] = rows[:, starts[i]:ends[i]].sum(axis=1)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_clipped_tail_and_empty():
    # Segments clipped at a capacity boundary (ends > P clamped by caller).
    rows = jnp.ones((2, 10), jnp.float32)
    starts = jnp.asarray([0, 4, 4, 8], jnp.int32)
    ends = jnp.asarray([4, 4, 8, 10], jnp.int32)   # seg 1 empty
    out = np.asarray(segment_rowsum(rows, starts, ends, interpret=True))
    np.testing.assert_allclose(out[0], [4.0, 0.0, 4.0, 2.0])
