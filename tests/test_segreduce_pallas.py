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


# ---------------------------------------------------------------------------
# rank_rowsum: rank-keyed reduction (the fused-path gradient reduce core).
# ---------------------------------------------------------------------------

from street_gaussians_ns_tpu.ops.segreduce_pallas import rank_rowsum  # noqa: E402


@pytest.mark.parametrize("seed,n_out,total", [(0, 700, 3000),
                                              (1, 2100, 12000)])
def test_rank_rowsum_matches_oracle(seed, n_out, total):
    rng = np.random.default_rng(seed)
    ng = 10
    # sorted ranks with gaps, repeats, and a discard bucket at n_out
    ranks = np.sort(rng.integers(0, n_out + 1, size=total)).astype(np.int32)
    vals = rng.standard_normal((ng, total)).astype(np.float32)
    rows = np.concatenate([vals, ranks[None].astype(np.float32)], axis=0)
    out = rank_rowsum(jnp.asarray(rows), jnp.asarray(ranks), n_out,
                      interpret=True)
    ref = np.zeros((ng, n_out), np.float32)
    for r in range(n_out):
        sel = ranks == r
        ref[:, r] = vals[:, sel].sum(axis=1)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_rank_rowsum_all_discard():
    ng = 3
    total = 50
    ranks = np.full((total,), 7, np.int32)   # all in the discard bucket
    rows = np.concatenate([np.ones((ng, total), np.float32),
                           ranks[None].astype(np.float32)], axis=0)
    out = np.asarray(rank_rowsum(jnp.asarray(rows), jnp.asarray(ranks), 7,
                                 interpret=True))
    np.testing.assert_array_equal(out, np.zeros((ng, 7), np.float32))


def test_reduce_pair_grads_ranked_compaction_cond():
    """Exercise the live-row compaction branch (cap < nrows) against the
    full-size branch: synthetic gpair where most rows are dead zeros."""
    import jax
    from street_gaussians_ns_tpu.ops import composite_pallas as cp

    rng = np.random.default_rng(3)
    nrows, n = 1024, 300           # cap = 512 < nrows
    K = cp.K
    gpair = np.zeros((nrows, cp.NFEAT, K), np.float32)
    # 12 tiles, each with a couple of live chunks at scattered rows
    starts_l, nbwd_l = [], []
    pos = 0
    for t in range(12):
        nb = int(rng.integers(1, 3))
        starts_l.append(pos * K + int(rng.integers(0, K)))
        nbwd_l.append(nb)
        for c in range(nb):
            gpair[pos + c, :10, :] = rng.standard_normal((10, K)) * 0.1
            gpair[pos + c, 10, :] = rng.integers(0, n, size=K)
        pos += nb + int(rng.integers(1, 60))   # dead gap
    starts = jnp.asarray(starts_l, jnp.int32)
    nbwd = jnp.asarray(nbwd_l, jnp.int32)
    num_pairs = jnp.int32(pos * K)
    depth_order = jnp.asarray(rng.permutation(n).astype(np.int32))
    gp = jnp.asarray(gpair)

    out = cp._reduce_pair_grads_ranked(gp, starts, nbwd, num_pairs,
                                       depth_order, n, interpret=True)
    # oracle: accumulate all rows by their rank, then un-sort
    ref_rank = np.zeros((n, 10), np.float32)
    flat_rank = gpair[:, 10, :].reshape(-1).astype(np.int64)
    flat_vals = gpair[:, :10, :].transpose(0, 2, 1).reshape(-1, 10)
    np.add.at(ref_rank, np.clip(flat_rank, 0, n - 1), flat_vals)
    inv = np.empty(n, np.int64)
    inv[np.asarray(depth_order)] = np.arange(n)
    ref = ref_rank[inv]
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)
