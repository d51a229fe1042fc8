"""Unit tests for quaternions, SH, and EWA projection."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from street_gaussians_ns_tpu.core import quaternions as quat
from street_gaussians_ns_tpu.core import sh
from street_gaussians_ns_tpu.core.cameras import Camera, viewmat_from_c2w
from street_gaussians_ns_tpu.core.projection import project, compute_cov3d


class TestQuaternions:
    def test_identity_rotmat(self):
        q = jnp.array([1.0, 0.0, 0.0, 0.0])
        np.testing.assert_allclose(quat.to_rotmat(q), jnp.eye(3), atol=1e-6)

    def test_rotmat_roundtrip(self):
        key = jax.random.PRNGKey(0)
        q = quat.random_quats(key, 64)
        m = quat.to_rotmat(q)
        q2 = quat.from_rotmat(m)
        # q and -q encode the same rotation.
        dot = jnp.abs(jnp.sum(q * q2, axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-5)

    def test_rotmat_orthonormal(self):
        q = quat.random_quats(jax.random.PRNGKey(1), 32)
        m = quat.to_rotmat(q)
        eye = jnp.einsum("nij,nkj->nik", m, m)
        np.testing.assert_allclose(eye, jnp.broadcast_to(jnp.eye(3), eye.shape), atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(m), 1.0, atol=1e-5)

    def test_multiply_matches_rotmat_product(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(2))
        a = quat.random_quats(k1, 16)
        b = quat.random_quats(k2, 16)
        m_ab = quat.to_rotmat(quat.multiply(a, b))
        m_ref = quat.to_rotmat(a) @ quat.to_rotmat(b)
        np.testing.assert_allclose(m_ab, m_ref, atol=1e-5)

    def test_rotate_vec(self):
        q = quat.random_quats(jax.random.PRNGKey(3), 8)
        v = jax.random.normal(jax.random.PRNGKey(4), (8, 3))
        np.testing.assert_allclose(
            quat.rotate_vec(q, v), jnp.einsum("nij,nj->ni", quat.to_rotmat(q), v), atol=1e-5
        )

    def test_slerp_endpoints_and_midpoint(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(5))
        q0 = quat.random_quats(k1, 8)
        q1 = quat.random_quats(k2, 8)
        s0 = quat.slerp(q0, q1, jnp.zeros((8, 1)))
        np.testing.assert_allclose(jnp.abs(jnp.sum(s0 * q0, -1)), 1.0, atol=1e-5)
        s1 = quat.slerp(q0, q1, jnp.ones((8, 1)))
        np.testing.assert_allclose(jnp.abs(jnp.sum(s1 * q1, -1)), 1.0, atol=1e-5)
        # Midpoint is unit norm and equidistant.
        sm = quat.slerp(q0, q1, jnp.full((8, 1), 0.5))
        np.testing.assert_allclose(jnp.linalg.norm(sm, axis=-1), 1.0, atol=1e-5)


class TestSH:
    def test_num_bases(self):
        assert [sh.num_sh_bases(d) for d in range(5)] == [1, 4, 9, 16, 25]

    def test_degree0_is_dc(self):
        dirs = jax.random.normal(jax.random.PRNGKey(0), (10, 3))
        dirs /= jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        coeffs = jax.random.normal(jax.random.PRNGKey(1), (10, 16, 3))
        out = sh.eval_sh(0, dirs, coeffs)
        np.testing.assert_allclose(out, sh.SH_C0 * coeffs[:, 0, :], atol=1e-6)

    def test_rgb2sh_roundtrip(self):
        rgb = jnp.array([[0.2, 0.5, 0.9]])
        np.testing.assert_allclose(sh.sh2rgb(sh.rgb2sh(rgb)), rgb, atol=1e-6)

    def test_active_degree_monotone_bases(self):
        """Masked bases: degree n output uses strictly more bases than n-1."""
        dirs = jnp.array([[0.0, 0.0, 1.0], [0.6, 0.8, 0.0]])
        coeffs = jnp.ones((2, 16, 3))
        outs = [sh.eval_sh(n, dirs, coeffs) for n in range(4)]
        for n in range(1, 4):
            assert not np.allclose(outs[n], outs[n - 1])

    def test_orthonormality(self):
        """Monte-Carlo check: int basis_i * basis_j over sphere = delta_ij / (4 pi)...
        i.e. mean over uniform sphere samples of b_i b_j ~= delta_ij / (4 pi) * 4 pi."""
        key = jax.random.PRNGKey(7)
        dirs = jax.random.normal(key, (200_000, 3))
        dirs /= jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        basis = sh.sh_basis(dirs, 3)  # (S, 16)
        gram = (basis.T @ basis) / dirs.shape[0] * (4 * jnp.pi)
        np.testing.assert_allclose(gram, np.eye(16), atol=0.15)


class TestProjection:
    def _simple_camera(self):
        # Camera at origin looking down -z (OpenGL), i.e. +z in render frame.
        c2w = jnp.array(
            [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]]
        )
        return Camera.make(fx=100.0, fy=100.0, cx=64.0, cy=64.0, c2w=c2w, width=128, height=128)

    def test_center_point_projects_to_principal_point(self):
        cam = self._simple_camera()
        vm = viewmat_from_c2w(cam.c2w)
        # A point 5 units in front of the camera: OpenGL forward is -z world here.
        means = jnp.array([[0.0, 0.0, -5.0]])
        scales = jnp.full((1, 3), 0.1)
        quats = jnp.array([[1.0, 0.0, 0.0, 0.0]])
        p = project(means, scales, quats, vm, cam.fx, cam.fy, cam.cx, cam.cy, 128, 128)
        np.testing.assert_allclose(p.xys[0], jnp.array([64.0, 64.0]), atol=1e-4)
        np.testing.assert_allclose(p.depths[0], 5.0, atol=1e-5)
        assert int(p.radii[0]) > 0

    def test_behind_camera_invisible(self):
        cam = self._simple_camera()
        vm = viewmat_from_c2w(cam.c2w)
        means = jnp.array([[0.0, 0.0, 5.0]])  # behind (OpenGL forward is -z)
        p = project(
            means, jnp.full((1, 3), 0.1), jnp.array([[1.0, 0, 0, 0]]),
            vm, cam.fx, cam.fy, cam.cx, cam.cy, 128, 128,
        )
        assert int(p.radii[0]) == 0
        assert int(p.num_tiles_hit[0]) == 0

    def test_isotropic_conic(self):
        """Isotropic gaussian at center: cov2d = (s*f/z)^2 I + 0.3 I."""
        cam = self._simple_camera()
        vm = viewmat_from_c2w(cam.c2w)
        s, z, f = 0.2, 4.0, 100.0
        p = project(
            jnp.array([[0.0, 0.0, -z]]), jnp.full((1, 3), s), jnp.array([[1.0, 0, 0, 0]]),
            vm, cam.fx, cam.fy, cam.cx, cam.cy, 128, 128,
        )
        expected_var = (s * f / z) ** 2 + 0.3
        np.testing.assert_allclose(p.conics[0, 0], 1.0 / expected_var, rtol=1e-4)
        np.testing.assert_allclose(p.conics[0, 2], 1.0 / expected_var, rtol=1e-4)
        np.testing.assert_allclose(p.conics[0, 1], 0.0, atol=1e-6)
        # 3-sigma radius.
        np.testing.assert_allclose(
            float(p.radii[0]), np.ceil(3 * np.sqrt(expected_var)), rtol=1e-6
        )
        # comp = sqrt(det_orig / det_blur)
        var0 = (s * f / z) ** 2
        np.testing.assert_allclose(p.comp[0], var0 / expected_var, rtol=1e-4)

    def test_cov3d(self):
        scales = jnp.array([[1.0, 2.0, 3.0]])
        q = jnp.array([[1.0, 0.0, 0.0, 0.0]])
        cov = compute_cov3d(scales, q)[0]
        np.testing.assert_allclose(cov, jnp.diag(jnp.array([1.0, 4.0, 9.0])), atol=1e-6)

    def test_tile_box_consistent_with_num_tiles(self):
        key = jax.random.PRNGKey(0)
        means = jax.random.normal(key, (100, 3)) * jnp.array([2.0, 2.0, 1.0]) - jnp.array([0, 0, 5.0])
        cam = self._simple_camera()
        vm = viewmat_from_c2w(cam.c2w)
        p = project(
            means, jnp.full((100, 3), 0.1), quat := jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (100, 1)),
            vm, cam.fx, cam.fy, cam.cx, cam.cy, 128, 128, tile_size=16,
        )
        box = np.asarray(p.tile_box)
        nt = (box[:, 1] - box[:, 0]) * (box[:, 3] - box[:, 2])
        np.testing.assert_array_equal(nt, np.asarray(p.num_tiles_hit))
        assert (box[:, 0] >= 0).all() and (box[:, 1] <= 8).all()

    def test_projection_grads_finite_diff(self):
        cam = self._simple_camera()
        vm = viewmat_from_c2w(cam.c2w)

        def f(means):
            p = project(
                means, jnp.full((1, 3), 0.3), jnp.array([[0.9, 0.1, 0.3, 0.2]]),
                vm, cam.fx, cam.fy, cam.cx, cam.cy, 128, 128,
            )
            return jnp.sum(p.xys) + jnp.sum(p.conics) + jnp.sum(p.depths)

        means = jnp.array([[0.5, -0.3, -4.0]])
        g = jax.grad(f)(means)
        eps = 1e-3
        for i in range(3):
            d = jnp.zeros_like(means).at[0, i].set(eps)
            fd = (f(means + d) - f(means - d)) / (2 * eps)
            np.testing.assert_allclose(g[0, i], fd, rtol=2e-2, atol=1e-3)
