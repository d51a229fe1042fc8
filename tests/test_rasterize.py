"""Rasterizer tests: tiled jnp compositor vs the per-pixel oracle, plus
gradient checks (autodiff vs finite differences through the full pipeline)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from street_gaussians_ns_tpu.core import quaternions as quat
from street_gaussians_ns_tpu.core.cameras import Camera, viewmat_from_c2w
from street_gaussians_ns_tpu.core.projection import project
from street_gaussians_ns_tpu.ops.rasterize_ref import rasterize_reference
from street_gaussians_ns_tpu.ops.tiles import bin_gaussians
from street_gaussians_ns_tpu.ops.composite_jnp import rasterize_tiles_jnp
from street_gaussians_ns_tpu.ops.composite_chunked import rasterize_tiles_chunked


def make_scene(n=200, seed=0, w=64, h=64):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    means = jnp.concatenate(
        [
            jax.random.normal(k1, (n, 2)) * 1.0,
            -jax.random.uniform(k2, (n, 1)) * 8.0 - 2.0,  # z in [-10, -2] (OpenGL fwd)
        ],
        axis=-1,
    )
    scales = jnp.exp(jax.random.normal(k3, (n, 3)) * 0.5 - 2.0)
    quats = quat.random_quats(k4, n)
    colors = jax.random.uniform(k5, (n, 3))
    opac = jax.random.uniform(jax.random.PRNGKey(seed + 99), (n,)) * 0.9 + 0.05
    c2w = jnp.eye(3, 4)
    cam = Camera.make(fx=60.0, fy=60.0, cx=w / 2, cy=h / 2, c2w=c2w, width=w, height=h)
    return means, scales, quats, colors, opac, cam


def full_pipeline(means, scales, quats, colors, opac, cam, tile_size=16, impl="tiles",
                  max_pairs=8192, max_per_tile=512, background=None):
    vm = viewmat_from_c2w(cam.c2w)
    p = project(means, scales, quats, vm, cam.fx, cam.fy, cam.cx, cam.cy,
                cam.width, cam.height, tile_size=tile_size)
    bg = background if background is not None else jnp.zeros((colors.shape[-1],))
    if impl == "oracle":
        return rasterize_reference(
            p.xys, p.depths, p.radii, p.conics, colors, opac, p.tile_box,
            cam.width, cam.height, tile_size=tile_size, background=bg,
        )
    bins = bin_gaussians(p, cam.width, cam.height, tile_size, max_pairs)
    if impl == "chunked":
        return rasterize_tiles_chunked(
            p.xys, p.conics, colors, opac, bins, cam.width, cam.height,
            tile_size, bg, max_per_tile, chunk=16,
        )
    return rasterize_tiles_jnp(
        p.xys, p.conics, colors, opac, bins, cam.width, cam.height, tile_size,
        bg, max_per_tile,
    )


class TestOracleBasics:
    def test_empty_scene_is_background(self):
        means, scales, quats, colors, opac, cam = make_scene(4)
        means = means + jnp.array([0.0, 0.0, 100.0])  # push all behind camera
        bg = jnp.array([0.2, 0.4, 0.6])
        img, alpha = full_pipeline(means, scales, quats, colors, opac, cam,
                                   impl="oracle", background=bg)
        np.testing.assert_allclose(img, jnp.broadcast_to(bg, img.shape), atol=1e-6)
        np.testing.assert_allclose(alpha, 0.0, atol=1e-6)

    def test_single_opaque_gaussian_center_color(self):
        """A huge opaque gaussian in front of the camera saturates center pixels."""
        means = jnp.array([[0.0, 0.0, -3.0]])
        scales = jnp.full((1, 3), 2.0)
        quats = jnp.array([[1.0, 0, 0, 0]])
        colors = jnp.array([[0.8, 0.1, 0.3]])
        opac = jnp.array([0.999])
        cam = Camera.make(60.0, 60.0, 32.0, 32.0, jnp.eye(3, 4), 64, 64)
        img, alpha = full_pipeline(means, scales, quats, colors, opac, cam, impl="oracle")
        center = img[32, 32]
        np.testing.assert_allclose(center, colors[0] * alpha[32, 32], rtol=1e-3)
        assert float(alpha[32, 32]) > 0.99

    def test_depth_ordering(self):
        """Near opaque gaussian should occlude far one."""
        means = jnp.array([[0.0, 0.0, -2.0], [0.0, 0.0, -8.0]])
        scales = jnp.full((2, 3), 1.5)
        quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1))
        colors = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        opac = jnp.array([0.999, 0.999])
        cam = Camera.make(60.0, 60.0, 32.0, 32.0, jnp.eye(3, 4), 64, 64)
        img, _ = full_pipeline(means, scales, quats, colors, opac, cam, impl="oracle")
        assert float(img[32, 32, 0]) > 0.95
        assert float(img[32, 32, 1]) < 0.05
        # Swapping declaration order must not change the result (depth sort).
        img2, _ = full_pipeline(means[::-1], scales, quats, colors[::-1], opac, cam,
                                impl="oracle")
        np.testing.assert_allclose(img, img2, atol=1e-6)


class TestTiledVsOracle:
    @pytest.mark.parametrize("impl", ["tiles", "chunked"])
    @pytest.mark.parametrize("seed,n", [
        (0, 50),
        pytest.param(1, 200, marks=pytest.mark.slow),
        pytest.param(2, 400, marks=pytest.mark.slow)])
    def test_tiled_matches_oracle(self, seed, n, impl):
        means, scales, quats, colors, opac, cam = make_scene(n, seed)
        img_o, a_o = full_pipeline(means, scales, quats, colors, opac, cam, impl="oracle")
        img_t, a_t = full_pipeline(means, scales, quats, colors, opac, cam, impl=impl)
        np.testing.assert_allclose(img_t, img_o, atol=1e-5)
        np.testing.assert_allclose(a_t, a_o, atol=1e-5)

    @pytest.mark.parametrize("impl", ["tiles", "chunked"])
    def test_invisible_gaussians_interleaved(self, impl):
        """Zero-tile-count gaussians interleaved with visible ones: the
        binning owner computation must keep FULL indices (regression for
        the compact-counting mis-index)."""
        means, scales, quats, colors, opac, cam = make_scene(120, 11)
        # Push every third gaussian behind the camera.
        behind = jnp.arange(120) % 3 == 0
        means = jnp.where(behind[:, None],
                          means * jnp.array([1.0, 1.0, -1.0]), means)
        img_o, a_o = full_pipeline(means, scales, quats, colors, opac, cam,
                                   impl="oracle")
        img_t, a_t = full_pipeline(means, scales, quats, colors, opac, cam,
                                   impl=impl)
        np.testing.assert_allclose(img_t, img_o, atol=1e-5)

    def test_chunked_saturation_termination(self):
        """Stacks of near-opaque splats: T crosses 1e-4 mid-sequence, so the
        cross-chunk done-latch must freeze T exactly where the oracle does."""
        n = 96
        key = jax.random.PRNGKey(7)
        means = jnp.concatenate(
            [jax.random.normal(key, (n, 2)) * 0.2,
             -jnp.linspace(2.0, 9.0, n)[:, None]], axis=-1)
        scales = jnp.full((n, 3), 0.8)
        quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n, 1))
        colors = jax.random.uniform(jax.random.PRNGKey(8), (n, 3))
        opac = jnp.full((n,), 0.95)
        cam = Camera.make(60.0, 60.0, 32.0, 32.0, jnp.eye(3, 4), 64, 64)
        img_o, a_o = full_pipeline(means, scales, quats, colors, opac, cam, impl="oracle")
        img_c, a_c = full_pipeline(means, scales, quats, colors, opac, cam, impl="chunked")
        np.testing.assert_allclose(img_c, img_o, atol=1e-5)
        np.testing.assert_allclose(a_c, a_o, atol=1e-5)

    def test_tiled_matches_oracle_with_background_and_4ch(self):
        means, scales, quats, colors, opac, cam = make_scene(100, 3)
        colors4 = jnp.concatenate([colors, jnp.linspace(1, 5, 100)[:, None]], axis=-1)
        bg = jnp.array([0.1, 0.2, 0.3, 0.0])
        img_o, a_o = full_pipeline(means, scales, quats, colors4, opac, cam,
                                   impl="oracle", background=bg)
        img_t, a_t = full_pipeline(means, scales, quats, colors4, opac, cam,
                                   impl="tiles", background=bg)
        np.testing.assert_allclose(img_t, img_o, atol=1e-5)

    def test_nondivisible_image_size(self):
        means, scales, quats, colors, opac, cam0 = make_scene(100, 4)
        cam = Camera.make(60.0, 60.0, 30.0, 25.0, jnp.eye(3, 4), 61, 49)
        img_o, a_o = full_pipeline(means, scales, quats, colors, opac, cam, impl="oracle")
        img_t, a_t = full_pipeline(means, scales, quats, colors, opac, cam, impl="tiles")
        assert img_t.shape == (49, 61, 3)
        np.testing.assert_allclose(img_t, img_o, atol=1e-5)


class TestGradients:
    @pytest.mark.slow
    def test_grads_match_between_impls(self):
        means, scales, quats, colors, opac, cam = make_scene(60, 5, w=32, h=32)
        target = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))

        def loss(impl):
            def f(args):
                m, s, q, c, o = args
                img, alpha = full_pipeline(m, s, q, c, o, cam, impl=impl)
                return jnp.mean(jnp.abs(img - target)) + 0.1 * jnp.mean(alpha)
            return f

        args = (means, scales, quats, colors, opac)
        g_o = jax.grad(loss("oracle"))(args)
        g_t = jax.grad(loss("tiles"))(args)
        g_c = jax.grad(loss("chunked"))(args)
        for a, b in zip(g_o, g_t):
            np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-3)
        for a, b in zip(g_o, g_c):
            np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-3)

    @pytest.mark.slow   # ~30 s; autodiff-vs-chunked grads stay default
    def test_grads_finite_diff(self):
        means, scales, quats, colors, opac, cam = make_scene(20, 6, w=24, h=24)
        target = jnp.zeros((24, 24, 3))

        def f(m):
            img, _ = full_pipeline(m, scales, quats, colors, opac, cam, impl="tiles")
            return jnp.mean((img - target) ** 2)

        g = jax.grad(f)(means)
        eps = 1e-3
        rng = np.random.RandomState(0)
        checked = 0
        for _ in range(8):
            i, j = rng.randint(20), rng.randint(3)
            d = jnp.zeros_like(means).at[i, j].set(eps)
            fd = (f(means + d) - f(means - d)) / (2 * eps)
            if abs(float(fd)) < 1e-6 and abs(float(g[i, j])) < 1e-6:
                continue
            np.testing.assert_allclose(g[i, j], fd, rtol=5e-2, atol=1e-5)
            checked += 1
        assert checked >= 3
