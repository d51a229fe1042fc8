"""Data-layer tests: COLMAP bin/txt readers (against byte layouts written
here), PLY round-trip + Inria export layout, annotation parsing, pose
orientation math, dataparser end-to-end on a synthetic clip."""
import json
import struct
from pathlib import Path

import numpy as np
import pytest

from street_gaussians_ns_tpu.data import colmap_io
from street_gaussians_ns_tpu.data.annotations import load_annotations
from street_gaussians_ns_tpu.data.dataparser import (
    DataParserConfig, auto_orient_and_center_poses, parse_scene,
    rotation_matrix_between)
from street_gaussians_ns_tpu.data.dataset import (SEM_GROUND, SEM_SKY,
                                                  load_semantics)
from street_gaussians_ns_tpu.data.ply_io import (read_ply_points, write_ply,
                                                 write_gaussian_ply, read_ply)


# ---------------------------------------------------------------- fixtures

def write_colmap_binary(recon: Path, n_cams=2, n_frames=6):
    recon.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(0)
    with open(recon / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", n_cams))
        for cid in range(1, n_cams + 1):
            # PINHOLE fx fy cx cy
            f.write(struct.pack("<iiQQ", cid, 1, 64, 48))
            f.write(struct.pack("<4d", 60.0 + cid, 61.0 + cid, 32.0, 24.0))
    names = []
    with open(recon / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", n_frames))
        for i in range(1, n_frames + 1):
            q = rng.randn(4)
            q /= np.linalg.norm(q)
            t = rng.randn(3) * 0.1 + [0, 0, 4.0]
            cam_id = 1 + (i - 1) % n_cams
            name = f"cam{cam_id}/{1000000000000000 + i}.jpg"
            names.append(name)
            f.write(struct.pack("<idddddddi", i, *q, *t, cam_id))
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", 2))
            for p in range(2):
                f.write(struct.pack("<ddq", 1.0 * p, 2.0 * p, p))
    with open(recon / "points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", 50))
        for i in range(50):
            f.write(struct.pack("<QdddBBBd", i, *rng.randn(3), 10, 20, 30,
                                0.5))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 1, 0))
    return names


def write_clip(tmp: Path, with_annotations=True):
    names = write_colmap_binary(tmp / "colmap/sparse/0")
    # images + segs
    from PIL import Image
    for name in names:
        p = tmp / "images" / name
        p.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(
            (np.random.RandomState(0).rand(48, 64, 3) * 255).astype(np.uint8)
        ).save(p)
        sp = (tmp / "segs" / name).with_suffix(".png")
        sp.parent.mkdir(parents=True, exist_ok=True)
        seg = np.zeros((48, 64), np.uint8)
        seg[:10] = 27     # sky strip
        seg[40:] = 7      # ground strip
        Image.fromarray(seg).save(sp)
    # transform.json
    ts0 = 1000000000000000
    meta = {"frames": [
        {"file_path": f"images/{n}", "timestamp": ts0 + i,
         "transform_matrix": np.eye(4).tolist()}
        for i, n in enumerate(names)]}
    json.dump(meta, open(tmp / "transform.json", "w"))
    if with_annotations:
        lidar = tmp / "aggregate_lidar/dynamic_objects"
        lidar.mkdir(parents=True)
        pts = np.random.RandomState(1).randn(12000, 3).astype(np.float32)
        write_ply(lidar / "veh1.ply", {
            "x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2],
            "red": np.full(12000, 128, np.uint8),
            "green": np.full(12000, 64, np.uint8),
            "blue": np.full(12000, 32, np.uint8)})
        anno = {"frames": [
            {"timestamp": ts0 + i, "objects": [
                {"gid": "veh1", "type": "car", "is_moving": True,
                 "translation": [float(i), 0.0, 0.0],
                 "rotation": [1.0, 0.0, 0.0, 0.0],
                 "size": [4.0, 2.0, 1.5]},
                {"gid": "parked", "type": "car", "is_moving": False,
                 "translation": [9.0, 9.0, 9.0],
                 "rotation": [1.0, 0.0, 0.0, 0.0],
                 "size": [4.0, 2.0, 1.5]},
            ]} for i in range(3)]}
        json.dump(anno, open(tmp / "annotation.json", "w"))
    return names


# ------------------------------------------------------------------- tests

class TestColmapIO:
    def test_binary_roundtrip(self, tmp_path):
        write_colmap_binary(tmp_path)
        cams = colmap_io.read_cameras(tmp_path)
        assert len(cams) == 2 and cams[1].model == "PINHOLE"
        np.testing.assert_allclose(cams[1].params, [61.0, 62.0, 32.0, 24.0])
        ims = colmap_io.read_images(tmp_path)
        assert len(ims) == 6
        assert ims[1].name.startswith("cam1/")
        assert ims[1].point3d_ids.tolist() == [0, 1]
        xyz, rgb, err, ids = colmap_io.read_points3d(
            tmp_path / "points3D.bin")
        assert xyz.shape == (50, 3) and rgb[0].tolist() == [10, 20, 30]

    def test_qvec_rotmat_roundtrip(self):
        rng = np.random.RandomState(3)
        for _ in range(10):
            q = rng.randn(4)
            q /= np.linalg.norm(q)
            R = colmap_io.qvec2rotmat(q)
            q2 = colmap_io.rotmat2qvec(R)
            assert min(np.abs(q - q2).max(), np.abs(q + q2).max()) < 1e-8


class TestPly:
    def test_roundtrip(self, tmp_path):
        pts = np.random.RandomState(0).randn(100, 3).astype(np.float32)
        write_ply(tmp_path / "a.ply", {"x": pts[:, 0], "y": pts[:, 1],
                                       "z": pts[:, 2]})
        xyz, rgb = read_ply_points(tmp_path / "a.ply")
        np.testing.assert_allclose(xyz, pts, rtol=1e-6)
        assert rgb is None

    def test_gaussian_ply_layout(self, tmp_path):
        n, k = 20, 16
        rng = np.random.RandomState(0)
        means = rng.randn(n, 3).astype(np.float32)
        means[3, 0] = np.nan  # must be filtered
        written = write_gaussian_ply(
            tmp_path / "gs.ply", means, rng.randn(n, 3),
            rng.randn(n, k - 1, 3), rng.randn(n), rng.randn(n, 3),
            rng.randn(n, 4))
        assert written == n - 1
        v = read_ply(tmp_path / "gs.ply")
        expected = (["x", "y", "z", "nx", "ny", "nz"]
                    + [f"f_dc_{i}" for i in range(3)]
                    + [f"f_rest_{i}" for i in range(3 * (k - 1))]
                    + ["opacity"] + [f"scale_{i}" for i in range(3)]
                    + [f"rot_{i}" for i in range(4)])
        assert list(v.keys()) == expected


class TestOrientation:
    def test_rotation_matrix_between(self):
        rng = np.random.RandomState(0)
        for _ in range(5):
            a, b = rng.randn(3), rng.randn(3)
            R = rotation_matrix_between(a, b)
            np.testing.assert_allclose(R @ (a / np.linalg.norm(a)),
                                       b / np.linalg.norm(b), atol=1e-8)

    def test_orient_up_and_center(self):
        rng = np.random.RandomState(1)
        poses = np.tile(np.eye(4), (10, 1, 1))
        # camera y axes all pointing at some skew direction
        tilt = rotation_matrix_between(np.array([0, 0, 1.0]),
                                       np.array([0.3, 0.2, 0.9]))
        poses[:, :3, :3] = tilt
        poses[:, :3, 3] = rng.randn(10, 3) + 5.0
        oriented, transform = auto_orient_and_center_poses(poses)
        # Mean origin at 0; mean up aligned to +z.
        np.testing.assert_allclose(oriented[:, :3, 3].mean(0), 0, atol=1e-8)
        up = oriented[:, :3, 1].mean(0)
        np.testing.assert_allclose(up / np.linalg.norm(up), [0, 0, 1],
                                   atol=1e-8)


class TestAnnotations:
    def test_load_and_filter(self, tmp_path):
        write_clip(tmp_path)
        db, tracks = load_annotations(
            tmp_path / "annotation.json",
            lidar_path=tmp_path / "aggregate_lidar/dynamic_objects",
            scale_factor=2.0)
        # parked car filtered (not moving); veh1 kept
        assert db.track_ids == ["veh1"]
        assert tracks.num_frames == 3 and tracks.num_objects == 1
        # EXP_RATE inflation * scale 2
        np.testing.assert_allclose(db.sizes[0],
                                   np.array([4, 2, 1.5]) *
                                   np.array([1.3, 1.3, 1.1]) * 2.0,
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(tracks.centers)[1, 0],
                                   [2.0, 0.0, 0.0], atol=1e-6)
        xyz, rgb = db.seed_points["veh1"]
        assert xyz.shape[0] == 12000 and rgb.shape == (12000, 3)


class TestDataParser:
    def test_parse_synthetic_clip(self, tmp_path):
        write_clip(tmp_path)
        cfg = DataParserConfig(data=tmp_path, load_dynamic_annotations=True)
        scene = parse_scene(cfg)
        assert scene.num_frames == 6
        # sorted by (camera_id, time): first 3 frames are camera 1
        assert scene.camera_ids[:3].tolist() == [1, 1, 1]
        # poses oriented + scaled into unit box
        assert np.abs(scene.c2w[:, :3, 3]).max() <= 1.0 + 1e-5
        assert scene.points_xyz.shape == (50, 3)
        assert len(scene.train_indices) + len(scene.eval_indices) == 6
        assert scene.annotations.track_ids == ["veh1"]
        # times rebased to seconds, start at 0
        assert scene.times.min() == 0.0
        assert scene.times.max() < 1.0

    def test_filter_camera_id(self, tmp_path):
        write_clip(tmp_path, with_annotations=False)
        cfg = DataParserConfig(data=tmp_path, filter_camera_id=[1],
                               load_dynamic_annotations=False)
        scene = parse_scene(cfg)
        used = set(scene.train_indices) | set(scene.eval_indices)
        assert all(scene.camera_ids[i] == 1 for i in used)


class TestSemantics:
    def test_remap(self, tmp_path):
        from PIL import Image
        seg = np.zeros((8, 8), np.uint8)
        seg[0] = 27
        seg[1] = 7
        seg[2] = 24
        seg[3] = 5
        Image.fromarray(seg).save(tmp_path / "s.png")
        out = load_semantics(tmp_path / "s.png")
        assert (out[0] == SEM_SKY).all()
        assert (out[1] == SEM_GROUND).all()
        assert (out[2] == SEM_GROUND).all()
        assert (out[3] == 0).all()


class TestDataManager:
    def test_epoch_sampling_without_replacement(self, tmp_path):
        from street_gaussians_ns_tpu.data.datamanager import (
            DataManagerConfig, FullImageDatamanager)
        write_clip(tmp_path, with_annotations=False)
        scene = parse_scene(DataParserConfig(
            data=tmp_path, load_dynamic_annotations=False))
        dm = FullImageDatamanager(scene, DataManagerConfig(undistort=False))
        seen = []
        for _ in range(dm.num_train):
            cam, batch = dm.next_train()
            seen.append(float(cam.time))
            assert batch["image"].shape == (48, 64, 3)
            assert "semantic" in batch
        assert len(set(seen)) == dm.num_train  # each frame exactly once
        evals = list(dm.fixed_indices_eval())
        assert len(evals) == dm.num_eval


class TestNativeColmapReader:
    def test_native_matches_python(self, tmp_path):
        """The C++ points3D parser and the Python struct loop agree."""
        import struct

        from street_gaussians_ns_tpu import native
        from street_gaussians_ns_tpu.data import colmap_io

        rng = np.random.RandomState(11)
        path = tmp_path / "points3D.bin"
        n = 137
        with open(path, "wb") as f:
            f.write(struct.pack("<Q", n))
            for i in range(n):
                f.write(struct.pack("<QdddBBBd", i * 7, *rng.randn(3),
                                    i % 256, (3 * i) % 256, (7 * i) % 256,
                                    rng.rand()))
                tl = int(rng.randint(0, 5))
                f.write(struct.pack("<Q", tl))
                for p in range(tl):
                    f.write(struct.pack("<ii", p, p + 1))
        out_native = native.read_points3d_binary(path)
        if out_native is None:
            import pytest
            pytest.skip("native extension unavailable (no g++)")
        # Force the Python fallback for comparison.
        import unittest.mock as mock
        with mock.patch.object(native, "_lib", None), \
                mock.patch.object(native, "_lib_failed", True):
            out_py = colmap_io.read_points3d_binary(path)
        for a, b in zip(out_native, out_py):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestFisheye624:
    """FISHEYE624 camera model (data/fisheye624.py) — the reference's
    sgn_datamanager.py:399-493 branch."""

    PARAMS = np.array([300.0, 300.0, 256.0, 256.0,      # fx fy cx cy
                       0.05, -0.02, 0.01, -0.005, 0.002, -0.001,  # k0..k5
                       1e-3, -5e-4,                     # p0 p1
                       2e-4, -1e-4, 3e-4, 1e-4])        # s0..s3

    def test_project_center_ray(self):
        from street_gaussians_ns_tpu.data import fisheye624
        uv = fisheye624.project(np.array([[0.0, 0.0, 1.0]]), self.PARAMS)
        np.testing.assert_allclose(uv[0], [256.0, 256.0], atol=1e-9)

    def test_radial_roundtrip(self):
        """unproject_radial inverts project when tangential/prism are 0."""
        from street_gaussians_ns_tpu.data import fisheye624
        params = self.PARAMS.copy()
        params[10:] = 0.0
        rng = np.random.RandomState(3)
        rays = rng.randn(200, 3)
        rays[:, 2] = np.abs(rays[:, 2]) + 0.5
        rays /= np.linalg.norm(rays, axis=1, keepdims=True)
        uv = fisheye624.project(rays, params)
        back = fisheye624.unproject_radial(uv, params)
        np.testing.assert_allclose(back, rays, atol=1e-6)

    def test_undistort_geometry(self):
        """Undistorted pixel (x, y) must sample the distorted image at
        project(ray(x, y)) — encode distorted pixel coords as image
        channels and check the remap reproduces the forward model."""
        pytest.importorskip("cv2")
        from street_gaussians_ns_tpu.data import fisheye624
        h = w = 512
        yy, xx = np.mgrid[:h, :w].astype(np.float32)
        img = np.stack([xx, yy, np.zeros_like(xx)], axis=-1)
        out, (fx, fy, ncx, ncy), mask, _ = (
            fisheye624.undistort_frame_fisheye624(img, self.PARAMS, 200.0))
        side = out.shape[0]
        assert out.shape == (side, side, 3) and side == 400
        u, v = np.meshgrid(np.arange(side), np.arange(side), indexing="xy")
        rays = np.stack([(u - ncx) / fx, (v - ncy) / fy,
                         np.ones_like(u, np.float64)], axis=-1)
        expect = fisheye624.project(rays.reshape(-1, 3),
                                    self.PARAMS).reshape(side, side, 2)
        inside = mask[..., 0] & (expect[..., 0] > 1) & (expect[..., 1] > 1) \
            & (expect[..., 0] < w - 2) & (expect[..., 1] < h - 2)
        assert inside.mean() > 0.3
        # bilinear remap of a linear ramp is exact up to interpolation
        np.testing.assert_allclose(out[inside][:, 0], expect[inside][:, 0],
                                   atol=0.51)
        np.testing.assert_allclose(out[inside][:, 1], expect[inside][:, 1],
                                   atol=0.51)

    def test_thin_prism_colmap_mapping(self):
        """THIN_PRISM_FISHEYE COLMAP params land in the right fisheye624
        slots and tag the frame as FISHEYE624."""
        from street_gaussians_ns_tpu.core import cameras
        cam = colmap_io.ColmapCamera(
            camera_id=1, model="THIN_PRISM_FISHEYE", width=512, height=512,
            params=np.array([300.0, 301.0, 255.0, 257.0,
                             0.1, 0.2, 0.01, 0.02, 0.3, 0.4, 0.05, 0.06]))
        fx, fy, cx, cy, d, model = colmap_io.camera_intrinsics(cam)
        assert model == cameras.FISHEYE624
        assert (fx, fy, cx, cy) == (300.0, 301.0, 255.0, 257.0)
        assert (d["k1"], d["k2"], d["k3"], d["k4"]) == (0.1, 0.2, 0.3, 0.4)
        assert (d["p1"], d["p2"]) == (0.01, 0.02)
        assert (d["s1"], d["s3"]) == (0.05, 0.06)
        assert d["s2"] == d["s4"] == 0.0 and d["k5"] == d["k6"] == 0.0


class TestDiskCacheAndAutoDownscale:
    def test_auto_downscale_factor(self):
        from street_gaussians_ns_tpu.data.dataset import (
            auto_downscale_factor)
        assert auto_downscale_factor(1600, 1056) == 1
        assert auto_downscale_factor(1920, 1280) == 2
        assert auto_downscale_factor(3840, 2160) == 4
        assert auto_downscale_factor(64, 48) == 1

    def test_second_datamanager_hits_disk_cache(self, tmp_path):
        """The reference persists undistorted/downscaled frames in
        `_ud`/`_2` sibling dirs (sgn_dataparser.py:544-753); a second
        Trainer/datamanager construction must read the cache instead of
        re-running OpenCV."""
        from street_gaussians_ns_tpu.data import dataset as ds
        from street_gaussians_ns_tpu.data.datamanager import (
            DataManagerConfig, FullImageDatamanager)
        from street_gaussians_ns_tpu.data.dataparser import (
            DataParserConfig, parse_scene)

        write_clip(tmp_path)
        scene = parse_scene(DataParserConfig(
            data=tmp_path, load_dynamic_annotations=False))
        cfg = DataManagerConfig(undistort=False, downscale=2,
                                disk_cache=True, cache_workers=2)
        dm1 = FullImageDatamanager(scene, cfg)
        cam, batch = dm1.fixed_indices_train().__next__()
        assert batch["image"].shape[0] == 24    # 48 // 2
        cache_dirs = list(tmp_path.glob("images_2"))
        assert cache_dirs, "cache dir images_2/ must exist"
        npzs = list(cache_dirs[0].rglob("*.npz"))
        assert npzs

        # Second construction: loads come from the cache (poison the
        # loader to prove no decode+resize happens).
        orig = ds.load_image
        ds.load_image = lambda p: (_ for _ in ()).throw(
            AssertionError("cache miss: load_image called"))
        try:
            dm2 = FullImageDatamanager(scene, cfg)
        finally:
            ds.load_image = orig
        cam2, batch2 = dm2.fixed_indices_train().__next__()
        np.testing.assert_allclose(batch2["image"], batch["image"],
                                   atol=1 / 255.0)
        assert (cam2.fx, cam2.fy) == (cam.fx, cam.fy)
