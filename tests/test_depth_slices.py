"""Single-chip depth-slice decomposition (round 5): the k-way sliced
fused path must match the monolithic fused path exactly — forward image,
alpha, AND gradients to every input — since slices partition the global
depth-rank order and the over-operator layer merge is exact. Runs in
interpret mode on CPU (same code path as compiled TPU)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_pallas_composite import make_scene

from street_gaussians_ns_tpu.core.cameras import viewmat_from_c2w
from street_gaussians_ns_tpu.core.projection import project
from street_gaussians_ns_tpu.ops.composite_pallas import (
    rasterize_tiles_pallas_fused)

MAX_PAIRS = 16384


def _run(n_slices, precision, n=220, seed=3, opaque=False,
         with_active_pad=False):
    means, scales, quats, colors, opac, cam = make_scene(n, seed,
                                                         opaque=opaque)
    if with_active_pad:
        # Trailing inactive slots (radius 0): the production store shape.
        opac = opac.at[-40:].set(0.0)

    def loss(means, scales, quats, colors, opac):
        vm = viewmat_from_c2w(cam.c2w)
        p = project(means, scales, quats, vm, cam.fx, cam.fy, cam.cx,
                    cam.cy, cam.width, cam.height, tile_size=16,
                    opacities=jax.lax.stop_gradient(opac))
        if with_active_pad:
            p = dataclasses.replace(
                p, radii=jnp.where(opac > 0, p.radii, 0),
                num_tiles_hit=jnp.where(opac > 0, p.num_tiles_hit, 0))
        img, alpha, bins = rasterize_tiles_pallas_fused(
            p, colors, opac, cam.width, cam.height, 16,
            jnp.zeros((4,), jnp.float32), MAX_PAIRS, None,
            interpret=True, last_color_is_depth=True,
            precision=precision, depth_slices=n_slices)
        return (jnp.mean(img * jnp.cos(img + 0.3))
                + 0.5 * jnp.mean(alpha * jnp.sin(alpha * 2.0)),
                (img, alpha, bins))

    (val, (img, alpha, bins)), grads = jax.value_and_grad(
        loss, argnums=(0, 1, 2, 3, 4), has_aux=True)(
        means, scales, quats, colors, opac)
    return val, img, alpha, bins, grads


class TestDepthSlices:
    @pytest.mark.parametrize("k,precision", [
        (3, "f32"),
        pytest.param(4, "bf16", marks=pytest.mark.slow),
        pytest.param(2, "f32", marks=pytest.mark.slow)])
    def test_matches_unsliced(self, k, precision):
        v1, img1, a1, b1, g1 = _run(1, precision)
        vk, imgk, ak, bk, gk = _run(k, precision)
        # Forward: identical compositing order => only fp-associativity
        # noise from the layer merge.
        np.testing.assert_allclose(imgk, img1, atol=3e-5)
        np.testing.assert_allclose(ak, a1, atol=3e-5)
        # Gradients to every differentiable input.
        for a, b in zip(gk, g1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, rtol=2e-4)

    def test_demand_counts(self):
        _, _, _, b1, _ = _run(1, "f32")
        _, _, _, b3, _ = _run(3, "f32")
        # Sliced bins report capacity DEMAND: k * max slice true count —
        # >= the true total, and (sanity) < k * total.
        assert int(b3.num_pairs) >= int(b1.num_pairs)
        assert int(b3.num_pairs) <= 3 * int(b1.num_pairs)
        assert int(b3.num_rowruns) >= int(b1.num_rowruns)
        # max_tile_count aggregates across slices exactly.
        assert int(b3.max_tile_count) == int(b1.max_tile_count)

    @pytest.mark.slow
    def test_inactive_pad_rows(self):
        v1, img1, a1, _, g1 = _run(1, "f32", with_active_pad=True)
        vk, imgk, ak, _, gk = _run(3, "f32", with_active_pad=True)
        np.testing.assert_allclose(imgk, img1, atol=3e-5)
        for a, b in zip(gk, g1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, rtol=2e-4)
