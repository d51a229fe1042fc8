"""Waymo-readiness coverage (VERDICT r3 #9): the one-command drill's
synthetic dry run, plus real-COLMAP quirk fixtures the synthetic clip was
too clean to exercise (unmatched observations, sparse points3D ids,
images with zero keypoints)."""
import json
import pathlib
import struct
import subprocess
import sys

import numpy as np
import pytest

from test_data import write_clip

ROOT = pathlib.Path(__file__).resolve().parents[1]


@pytest.mark.slow
def test_waymo_smoke_dry_run(tmp_path):
    """tools/waymo_smoke.py end-to-end on the synthetic clip: every
    checklist stage (parse/train/eval/render/export/resume) must pass."""
    clip = tmp_path / "clip"
    clip.mkdir()
    write_clip(clip)
    out = tmp_path / "smoke_out"
    env = {"PATH": "/usr/bin:/bin:/usr/local/bin",
           "HOME": str(pathlib.Path.home()),
           "JAX_PLATFORMS": "cpu"}
    r = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "waymo_smoke.py"),
         "--data", str(clip), "--out", str(out), "--steps", "12",
         "--bg-capacity", "2048", "--max-pairs", str(2 ** 15)],
        capture_output=True, text=True, timeout=1500, env=env)
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-3000:])
    assert "WAYMO SMOKE PASSED" in r.stdout
    rows = json.load(open(out / "smoke_checklist.json"))
    assert [row["stage"] for row in rows] == [
        "parse", "train", "eval", "render", "export", "resume"]
    assert all(row["ok"] for row in rows), rows


# --------------------------------------------------------------------------
# Real-COLMAP quirk fixtures
# --------------------------------------------------------------------------


def write_quirky_colmap(recon: pathlib.Path):
    """A reconstruction with real-COLMAP messiness the clean synthetic
    writer doesn't produce: unmatched observations (point3D_id == -1 in
    images.bin — the overwhelming majority of 2D keypoints in real runs),
    SPARSE non-contiguous points3D ids, a zero-keypoint image, and
    points observed from multiple cameras of the rig."""
    recon.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(3)
    with open(recon / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 2))
        for cid in (1, 2):
            f.write(struct.pack("<iiQQ", cid, 1, 64, 48))
            f.write(struct.pack("<4d", 60.0, 61.0, 32.0, 24.0))
    names = []
    with open(recon / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", 4))
        for i in range(1, 5):
            q = rng.randn(4)
            q /= np.linalg.norm(q)
            t = rng.randn(3) * 0.1 + [0, 0, 4.0]
            cam_id = 1 + (i - 1) % 2
            name = f"cam{cam_id}/{1000000000000000 + i}.jpg"
            names.append(name)
            f.write(struct.pack("<idddddddi", i, *q, *t, cam_id))
            f.write(name.encode() + b"\x00")
            if i == 4:
                f.write(struct.pack("<Q", 0))       # zero keypoints
                continue
            f.write(struct.pack("<Q", 5))
            for p in range(5):
                # Most observations unmatched (point3D_id = -1).
                pid = -1 if p % 3 else 7 + 1000000 * p
                f.write(struct.pack("<ddq", 1.0 * p, 2.0 * p, pid))
    ids = [7, 1000007, 2000007, 31337]               # sparse, unordered-ish
    with open(recon / "points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", len(ids)))
        for pid in ids:
            f.write(struct.pack("<QdddBBBd", pid, *rng.randn(3),
                                10, 20, 30, 0.5))
            f.write(struct.pack("<Q", 2))
            f.write(struct.pack("<ii", 1, 0))
            f.write(struct.pack("<ii", 2, 0))        # seen by both rig cams
    return names


def test_colmap_reader_handles_real_quirks(tmp_path):
    from street_gaussians_ns_tpu.data import colmap_io

    write_quirky_colmap(tmp_path)
    cams = colmap_io.read_cameras_binary(tmp_path / "cameras.bin")
    imgs = colmap_io.read_images_binary(tmp_path / "images.bin")
    xyz, rgb, err, ids = colmap_io.read_points3d_binary(
        tmp_path / "points3D.bin")
    assert len(cams) == 2 and len(imgs) == 4
    assert sorted(ids.tolist()) == sorted([7, 1000007, 2000007, 31337])
    assert xyz.shape == (4, 3) and np.isfinite(xyz).all()
    # The zero-keypoint image parsed and didn't desync the stream.
    assert any(len(np.atleast_1d(im.point3d_ids)) == 0
               for im in imgs.values())


def test_parse_scene_with_quirky_colmap(tmp_path):
    """The dataparser must survive unmatched observations + sparse
    points3D ids and still produce seed points + valid splits."""
    import json as _json

    from PIL import Image

    from street_gaussians_ns_tpu.data.dataparser import (DataParserConfig,
                                                         parse_scene)

    names = write_quirky_colmap(tmp_path / "colmap/sparse/0")
    for name in names:
        p = tmp_path / "images" / name
        p.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray((np.random.RandomState(0).rand(48, 64, 3)
                         * 255).astype(np.uint8)).save(p)
    ts0 = 1000000000000000
    meta = {"frames": [
        {"file_path": f"images/{n}", "timestamp": ts0 + i,
         "transform_matrix": np.eye(4).tolist()}
        for i, n in enumerate(names)]}
    _json.dump(meta, open(tmp_path / "transform.json", "w"))

    scene = parse_scene(DataParserConfig(data=tmp_path,
                                         load_dynamic_annotations=False))
    assert len(scene.image_paths) == 4
    assert scene.points_xyz is not None and len(scene.points_xyz) == 4
    assert np.isfinite(np.asarray(scene.points_xyz)).all()
