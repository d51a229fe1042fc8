"""Tests for the public render op: shapes, sky compositing, depth semantics,
differentiability through the full path (incl. sky)."""
import jax
import jax.numpy as jnp
import numpy as np

from street_gaussians_ns_tpu.core.cameras import Camera
from street_gaussians_ns_tpu.core import quaternions as quat
from street_gaussians_ns_tpu.ops.render import RenderConfig, render

CFG = RenderConfig(max_pairs=8192, max_per_tile=256, chunk=16)


def make_scene(n=100, seed=0, w=48, h=32):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    means = jnp.concatenate(
        [jax.random.normal(k1, (n, 2)),
         -jax.random.uniform(k2, (n, 1)) * 8.0 - 2.0], axis=-1)
    scales = jnp.exp(jax.random.normal(k3, (n, 3)) * 0.5 - 2.0)
    quats = quat.random_quats(k4, n)
    rgbs = jax.random.uniform(k5, (n, 3))
    opac = jax.random.uniform(jax.random.PRNGKey(seed + 1), (n,)) * 0.9 + 0.05
    cam = Camera.make(50.0, 50.0, w / 2, h / 2, jnp.eye(3, 4), w, h)
    return means, scales, quats, opac, rgbs, cam


class TestRender:
    def test_shapes_and_ranges(self):
        means, scales, quats, opac, rgbs, cam = make_scene()
        out = render(means, scales, quats, opac, rgbs, cam, CFG, training=False)
        assert out.rgb.shape == (32, 48, 3)
        assert out.accumulation.shape == (32, 48, 1)
        assert out.depth.shape == (32, 48, 1)
        assert float(out.rgb.min()) >= 0.0 and float(out.rgb.max()) <= 1.0
        assert float(out.accumulation.min()) >= 0.0
        assert float(out.accumulation.max()) <= 1.0

    def test_sky_fills_empty_pixels(self):
        means, scales, quats, opac, rgbs, cam = make_scene(4)
        means = means + jnp.array([0.0, 0.0, 100.0])  # all behind camera
        sky = jnp.full((32, 48, 3), 0.7)
        out = render(means, scales, quats, opac, rgbs, cam, CFG, sky_rgb=sky)
        np.testing.assert_allclose(out.rgb, 0.7, atol=1e-6)
        np.testing.assert_allclose(out.accumulation, 0.0, atol=1e-6)
        # Empty pixels get the far fill depth.
        np.testing.assert_allclose(out.depth, CFG.depth_far_fill, atol=1e-6)

    def test_depth_is_alpha_normalized(self):
        """A single fully opaque wall at z=-5 must read depth ~5."""
        means = jnp.array([[0.0, 0.0, -5.0]])
        scales = jnp.full((1, 3), 4.0)
        quats = jnp.array([[1.0, 0, 0, 0]])
        rgbs = jnp.array([[0.5, 0.5, 0.5]])
        opac = jnp.array([0.999])
        cam = Camera.make(50.0, 50.0, 24.0, 16.0, jnp.eye(3, 4), 48, 32)
        out = render(means, scales, quats, opac, rgbs, cam, CFG)
        assert abs(float(out.depth[16, 24, 0]) - 5.0) < 1e-2

    def test_grad_flows_to_all_params_and_sky(self):
        means, scales, quats, opac, rgbs, cam = make_scene(60, 3)
        sky = jnp.full((32, 48, 3), 0.3)
        target = jax.random.uniform(jax.random.PRNGKey(9), (32, 48, 3))

        def loss(args):
            m, s, q, o, c, sk = args
            out = render(m, s, q, o, c, cam, CFG, sky_rgb=sk)
            return jnp.mean(jnp.abs(out.rgb - target))

        g = jax.grad(loss)((means, scales, quats, opac, rgbs, sky))
        names = ["means", "scales", "quats", "opac", "rgbs", "sky"]
        for name, gi in zip(names, g):
            assert bool(jnp.all(jnp.isfinite(gi))), name
            assert float(jnp.abs(gi).max()) > 0.0, name

    def test_jit_compiles_once_per_resolution(self):
        means, scales, quats, opac, rgbs, cam = make_scene(50, 4)

        @jax.jit
        def f(m, s, q, o, c, cam):
            return render(m, s, q, o, c, cam, CFG).rgb

        r1 = f(means, scales, quats, opac, rgbs, cam)
        r2 = f(means + 0.01, scales, quats, opac, rgbs, cam)
        assert r1.shape == r2.shape
