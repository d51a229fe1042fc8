"""Pallas block-scan cumsum vs jnp.cumsum (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np

from street_gaussians_ns_tpu.ops.scan_pallas import cumsum_rows, BLOCK


class TestCumsumRows:
    def test_matches_jnp_multiple_blocks(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (3 * BLOCK, 16))
        out = cumsum_rows(x, interpret=True)
        np.testing.assert_allclose(out, jnp.cumsum(x, axis=0), rtol=1e-5,
                                   atol=1e-4)

    def test_non_multiple_rows(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (BLOCK + 37, 8))
        out = cumsum_rows(x, interpret=True)
        assert out.shape == x.shape
        np.testing.assert_allclose(out, jnp.cumsum(x, axis=0), rtol=1e-5,
                                   atol=1e-4)


class TestCummaxRows:
    def test_matches_lax_cummax(self):
        x = jax.random.randint(jax.random.PRNGKey(2), (2 * BLOCK + 100, 4),
                               -1000, 1000, dtype=jnp.int32)
        from street_gaussians_ns_tpu.ops.scan_pallas import cummax_rows
        out = cummax_rows(x, interpret=True)
        np.testing.assert_array_equal(out, jax.lax.cummax(x, axis=0))
