"""Aux subsystem tests: chamfer metric, camera optimizer exp maps, PCD IO,
SSIM/PSNR sanity, IDFT fourier basis, cubemap sampling."""
import jax
import jax.numpy as jnp
import numpy as np

from street_gaussians_ns_tpu.data.pcd_io import read_pcd, write_pcd
from street_gaussians_ns_tpu.models.camera_opt import (
    CameraOptConfig, apply_camera_opt, exp_map_SE3, exp_map_SO3xR3,
    init_camera_opt)
from street_gaussians_ns_tpu.models.fourier import fourier_dc, idft_basis
from street_gaussians_ns_tpu.ops.chamfer import chamfer_distance, CD_UNIT
from street_gaussians_ns_tpu.ops.cubemap import sample_cubemap
from street_gaussians_ns_tpu.ops.ssim import psnr, ssim


class TestChamfer:
    def test_identical_clouds_zero(self):
        pts = jax.random.normal(jax.random.PRNGKey(0), (500, 3))
        assert float(chamfer_distance(pts, pts)) < 1e-3

    def test_known_offset(self):
        a = jnp.zeros((10, 3))
        b = jnp.full((10, 3), 1.0 / jnp.sqrt(3.0))  # distance 1 from origin
        d = float(chamfer_distance(a, b))
        np.testing.assert_allclose(d, 1.0 / CD_UNIT, rtol=1e-4)


class TestCameraOpt:
    def test_zero_tangent_identity(self):
        for f in (exp_map_SO3xR3, exp_map_SE3):
            m = f(jnp.zeros((6,)))
            np.testing.assert_allclose(m, jnp.eye(3, 4), atol=1e-6)

    def test_rotation_magnitude(self):
        t = jnp.array([0.0, 0, 0, 0, 0, jnp.pi / 2])
        R = exp_map_SO3xR3(t)[:3, :3]
        # 90 deg about z: (1,0,0)->(0,1,0)
        np.testing.assert_allclose(R @ jnp.array([1.0, 0, 0]),
                                   [0.0, 1.0, 0.0], atol=1e-6)

    def test_apply_off_is_identity(self):
        cfg = CameraOptConfig(mode="off", num_cameras=3)
        c2w = jax.random.normal(jax.random.PRNGKey(0), (3, 4))
        out = apply_camera_opt(cfg, init_camera_opt(cfg), 0, c2w)
        np.testing.assert_allclose(out, c2w)

    def test_apply_so3xr3(self):
        cfg = CameraOptConfig(mode="SO3xR3", num_cameras=2)
        adj = init_camera_opt(cfg).at[1, :3].set(jnp.array([1.0, 2.0, 3.0]))
        c2w = jnp.eye(3, 4)
        out = apply_camera_opt(cfg, adj, jnp.int32(1), c2w)
        np.testing.assert_allclose(out[:, 3], [1.0, 2.0, 3.0], atol=1e-6)


class TestPcdIO:
    def test_roundtrip(self, tmp_path):
        xyz = np.random.RandomState(0).randn(100, 3).astype(np.float32)
        rgb = np.random.RandomState(1).randint(0, 255, (100, 3)).astype(
            np.float32)
        write_pcd(tmp_path / "a.pcd", xyz, rgb)
        x2, r2 = read_pcd(tmp_path / "a.pcd")
        np.testing.assert_allclose(x2, xyz, rtol=1e-6)
        np.testing.assert_allclose(r2, rgb)


class TestSsim:
    def test_identity_is_one(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))
        np.testing.assert_allclose(float(ssim(img, img)), 1.0, atol=1e-5)

    def test_noise_lowers_ssim(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))
        noisy = jnp.clip(img + jax.random.normal(jax.random.PRNGKey(1),
                                                 img.shape) * 0.2, 0, 1)
        assert float(ssim(img, noisy)) < 0.9

    def test_psnr_known(self):
        a = jnp.zeros((8, 8, 3))
        b = jnp.full((8, 8, 3), 0.1)
        np.testing.assert_allclose(float(psnr(a, b)), 20.0, atol=1e-4)


class TestFourier:
    def test_dim1_is_identity(self):
        np.testing.assert_allclose(np.asarray(idft_basis(0.37, 1)), [1.0])

    def test_reference_formula(self):
        t, dim = 0.3, 5
        basis = np.asarray(idft_basis(t, dim))
        expected = np.zeros(dim)
        for k in range(dim):
            if k % 2 == 0:
                expected[k] = np.cos(t * k * 2 * np.pi / dim)
            else:
                expected[k] = np.sin(t * (k + 1) * 2 * np.pi / dim)
        np.testing.assert_allclose(basis, expected, atol=1e-6)

    def test_fourier_dc_collapse(self):
        dc = jax.random.normal(jax.random.PRNGKey(0), (7, 5, 3))
        out = fourier_dc(dc, 0.3)
        expected = jnp.einsum("nfc,f->nc", dc, idft_basis(0.3, 5))
        np.testing.assert_allclose(out, expected, atol=1e-6)


class TestCubemap:
    def test_face_colors(self):
        cube = jnp.zeros((6, 8, 8, 3))
        for f in range(6):
            cube = cube.at[f].set(f / 10.0)
        dirs = jnp.array([
            [1.0, 0, 0], [-1.0, 0, 0], [0, 1.0, 0],
            [0, -1.0, 0], [0, 0, 1.0], [0, 0, -1.0]])
        out = sample_cubemap(cube, dirs)
        np.testing.assert_allclose(out[:, 0], jnp.arange(6) / 10.0,
                                   atol=1e-6)

    def test_grad_to_cubemap(self):
        cube = jnp.full((6, 4, 4, 3), 0.5)
        dirs = jax.random.normal(jax.random.PRNGKey(0), (50, 3))
        g = jax.grad(lambda c: jnp.sum(sample_cubemap(c, dirs)))(cube)
        assert float(jnp.abs(g).sum()) > 0


class TestCubemapMatmulPath:
    def test_matmul_matches_gather(self):
        """The TPU one-hot MXU sampler must reproduce the gather path
        (same bilinear weights, same edge clamping) for values AND the
        cubemap cotangent."""
        key = jax.random.PRNGKey(3)
        cube = jax.random.uniform(key, (6, 16, 16, 3))
        dirs = jax.random.normal(jax.random.fold_in(key, 1), (37, 11, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        ref = sample_cubemap(cube, dirs, method="gather")
        out = sample_cubemap(cube, dirs, method="matmul")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

        cot = jax.random.uniform(jax.random.fold_in(key, 2), ref.shape)
        g_ref = jax.grad(lambda c: jnp.sum(
            sample_cubemap(c, dirs, method="gather") * cot))(cube)
        g_out = jax.grad(lambda c: jnp.sum(
            sample_cubemap(c, dirs, method="matmul") * cot))(cube)
        np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref),
                                   atol=1e-5)
