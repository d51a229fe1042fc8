"""Pallas compositing kernel vs the (oracle-verified) chunked jnp path —
forward images and hand-derived backward vs autodiff, in interpret mode so
they run on the CPU test mesh exactly as compiled on TPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from street_gaussians_ns_tpu.core import quaternions as quat
from street_gaussians_ns_tpu.core.cameras import Camera, viewmat_from_c2w
from street_gaussians_ns_tpu.core.projection import project
from street_gaussians_ns_tpu.ops.composite_chunked import rasterize_tiles_chunked
from street_gaussians_ns_tpu.ops.composite_pallas import rasterize_tiles_pallas
from street_gaussians_ns_tpu.ops.tiles import bin_gaussians

MAX_PAIRS = 8192


def make_scene(n=200, seed=0, w=64, h=64, opaque=False):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    means = jnp.concatenate(
        [jax.random.normal(k1, (n, 2)),
         -jax.random.uniform(k2, (n, 1)) * 8.0 - 2.0], axis=-1)
    scales = jnp.exp(jax.random.normal(k3, (n, 3)) * 0.5 - 2.0)
    quats = quat.random_quats(k4, n)
    colors = jax.random.uniform(k5, (n, 4))  # rgb+depth-like 4ch
    opac = (jnp.full((n,), 0.95) if opaque else
            jax.random.uniform(jax.random.PRNGKey(seed + 9), (n,)) * 0.9 + 0.05)
    cam = Camera.make(60.0, 60.0, w / 2, h / 2, jnp.eye(3, 4), w, h)
    return means, scales, quats, colors, opac, cam


def project_and_bin(means, scales, quats, cam):
    vm = viewmat_from_c2w(cam.c2w)
    p = project(means, scales, quats, vm, cam.fx, cam.fy, cam.cx, cam.cy,
                cam.width, cam.height, tile_size=16)
    bins = bin_gaussians(p, cam.width, cam.height, 16, MAX_PAIRS)
    return p, bins


class TestPallasForward:
    @pytest.mark.parametrize("seed,n,opaque", [
        (0, 60, False),
        pytest.param(1, 200, False, marks=pytest.mark.slow),
        pytest.param(2, 300, True, marks=pytest.mark.slow)])
    def test_matches_chunked(self, seed, n, opaque):
        means, scales, quats, colors, opac, cam = make_scene(n, seed,
                                                             opaque=opaque)
        p, bins = project_and_bin(means, scales, quats, cam)
        bg = jnp.array([0.1, 0.2, 0.3, 0.0])
        img_c, a_c = rasterize_tiles_chunked(
            p.xys, p.conics, colors, opac, bins, cam.width, cam.height, 16,
            bg, max_per_tile=512, chunk=16)
        img_p, a_p = rasterize_tiles_pallas(
            p.xys, p.conics, colors, opac, bins, cam.width, cam.height, 16,
            bg, interpret=True)
        np.testing.assert_allclose(img_p, img_c, atol=2e-5)
        np.testing.assert_allclose(a_p, a_c, atol=2e-5)

    def test_nondivisible_resolution(self):
        means, scales, quats, colors, opac, _ = make_scene(100, 3)
        cam = Camera.make(60.0, 60.0, 30.0, 25.0, jnp.eye(3, 4), 61, 49)
        p, bins = project_and_bin(means, scales, quats, cam)
        bg = jnp.zeros((4,))
        img_c, a_c = rasterize_tiles_chunked(
            p.xys, p.conics, colors, opac, bins, 61, 49, 16, bg, 512, 16)
        img_p, a_p = rasterize_tiles_pallas(
            p.xys, p.conics, colors, opac, bins, 61, 49, 16, bg,
            interpret=True)
        assert img_p.shape == (49, 61, 4)
        np.testing.assert_allclose(img_p, img_c, atol=2e-5)


class TestPallasBackward:
    @pytest.mark.parametrize("seed,n,opaque", [
        (0, 60, False),
        pytest.param(2, 150, True, marks=pytest.mark.slow)])
    def test_grads_match_autodiff_chunked(self, seed, n, opaque):
        means, scales, quats, colors, opac, cam = make_scene(
            n, seed, w=48, h=32, opaque=opaque)
        p, bins = project_and_bin(means, scales, quats, cam)
        bg = jnp.zeros((4,))
        target = jax.random.uniform(jax.random.PRNGKey(7),
                                    (32, 48, 4))

        def loss(impl):
            def f(args):
                xys, conics, cols, op = args
                if impl == "pallas":
                    img, alpha = rasterize_tiles_pallas(
                        xys, conics, cols, op, bins, 48, 32, 16, bg,
                        interpret=True)
                else:
                    img, alpha = rasterize_tiles_chunked(
                        xys, conics, cols, op, bins, 48, 32, 16, bg, 512, 16)
                return (jnp.mean(jnp.abs(img - target))
                        + 0.3 * jnp.mean(alpha ** 2))
            return f

        args = (p.xys, p.conics, colors, opac)
        g_ref = jax.grad(loss("chunked"))(args)
        g_pal = jax.grad(loss("pallas"))(args)
        names = ["xys", "conics", "colors", "opac"]
        for nm, a, b in zip(names, g_pal, g_ref):
            np.testing.assert_allclose(a, b, atol=3e-5, rtol=2e-3,
                                       err_msg=nm)

    @pytest.mark.slow
    def test_grad_nonzero_and_finite(self):
        means, scales, quats, colors, opac, cam = make_scene(80, 5, w=32,
                                                             h=32)
        p, bins = project_and_bin(means, scales, quats, cam)
        bg = jnp.zeros((4,))

        def f(xys):
            img, _ = rasterize_tiles_pallas(xys, p.conics, colors, opac,
                                            bins, 32, 32, 16, bg,
                                            interpret=True)
            return jnp.mean(img ** 2)

        g = jax.grad(f)(p.xys)
        assert bool(jnp.all(jnp.isfinite(g)))
        assert float(jnp.abs(g).max()) > 0.0


class TestGradPackBF16:
    @pytest.mark.slow
    def test_packed_reduce_close_to_f32(self, monkeypatch):
        """The TPU-only bf16-packed permute gather rounds per-pair grads
        (~0.4% relative); per-gaussian sums must stay close to the f32
        path."""
        from street_gaussians_ns_tpu.ops import composite_pallas as cp

        means, scales, quats, colors, opac, cam = make_scene(100, 11, w=48,
                                                             h=32)
        p, bins = project_and_bin(means, scales, quats, cam)
        bg = jnp.zeros((4,))
        target = jax.random.uniform(jax.random.PRNGKey(3), (32, 48, 4))

        def loss(args):
            xys, conics, cols, op = args
            img, alpha = rasterize_tiles_pallas(
                xys, conics, cols, op, bins, 48, 32, 16, bg, interpret=True)
            return jnp.mean(jnp.abs(img - target)) + 0.3 * jnp.mean(alpha)

        args = (p.xys, p.conics, colors, opac)
        g_f32 = jax.grad(loss)(args)
        monkeypatch.setattr(cp, "GRAD_PACK_BF16", "force")
        g_pack = jax.grad(loss)(args)
        for nm, a, b in zip(["xys", "conics", "colors", "opac"], g_pack,
                            g_f32):
            scale = np.maximum(np.abs(np.asarray(b)), 1e-3)
            rel = np.abs(np.asarray(a) - np.asarray(b)) / scale
            assert rel.max() < 2e-2, (nm, rel.max())
