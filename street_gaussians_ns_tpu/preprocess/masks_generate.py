"""Dynamic-object masks for COLMAP feature masking.

Native equivalent of scripts/pythons/masks_generate.py: per image, project
every moving object's 3D box corners, inflate the 2D bbox by 1/10 per
side, zero the mask inside it, then restore near-black pixels (all RGB <
96) in the LOWER HALF of the box to value 1 (the reference's dark-pixel
heuristic for road under the car, :222-248). Untouched pixels stay 255.

Usage:
    python -m street_gaussians_ns_tpu.preprocess.masks_generate \
        --data /clip [--dilate 25]
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from ..data.annotations import quat_to_rotmat_np


def get_box_corners(translation, lwh, rotation_wxyz):
    l, w, h = lwh
    corners = np.array([
        [sx * l / 2, sy * w / 2, sz * h / 2]
        for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)])
    R = quat_to_rotmat_np(np.asarray(rotation_wxyz, np.float64))
    return corners @ R.T + np.asarray(translation)


def generate_masks(data: Path, dilate: int = 0) -> int:
    """Returns the number of masks written."""
    import cv2
    from PIL import Image

    meta = json.load(open(data / "transform.json"))
    annos = json.load(open(data / "annotation.json"))["frames"]
    anno_by_ts = {round(float(a["timestamp"]), 6): a["objects"]
                  for a in annos}

    written = 0
    for fr in meta["frames"]:
        if fr.get("type") == "lidar" or "fl_x" not in fr:
            continue
        image_path = data / fr["file_path"]
        if not image_path.exists():
            continue
        mask_path = data / "masks" / Path(fr["file_path"]).relative_to(
            "images")
        mask_path = mask_path.with_suffix(".png")
        mask_path.parent.mkdir(parents=True, exist_ok=True)
        w, h = int(fr["w"]), int(fr["h"])
        K = np.array([[fr["fl_x"], 0, fr["cx"]],
                      [0, fr["fl_y"], fr["cy"]], [0, 0, 1.0]])
        c2w = np.asarray(fr["transform_matrix"], np.float64)
        # OpenGL/blender pose -> OpenCV for projection.
        c2w = c2w[np.array([1, 0, 2, 3]), :]
        c2w[2, :] *= -1
        c2w[0:3, 1:3] *= -1
        w2c = np.linalg.inv(c2w)

        objects = anno_by_ts.get(round(float(fr["timestamp"]), 6), [])
        boxes = []
        for obj in objects:
            if not obj.get("is_moving"):
                continue
            corners = get_box_corners(obj["translation"], obj["size"],
                                      obj["rotation"])
            uvs = []
            for m in corners:
                p = w2c @ np.append(m, 1.0)
                if p[2] > 0:
                    uv = K @ p[:3]
                    uvs.append((uv[:2] / uv[2]).astype(int))
            if not uvs:
                continue
            us = [u for u, _ in uvs]
            vs = [v for _, v in uvs]
            umin, umax = max(min(us), 0), min(max(us), w - 1)
            vmin, vmax = max(min(vs), 0), min(max(vs), h - 1)
            if umin >= umax or vmin >= vmax:
                continue
            boxes.append([
                max(umin - (umax - umin) // 10, 0),
                max(vmin - (vmax - vmin) // 10, 0),
                min(umax + (umax - umin) // 10, w - 1),
                min(vmax + (vmax - vmin) // 10, h - 1)])

        mask = np.full((h, w), 255, np.uint8)
        if boxes:
            img = cv2.cvtColor(cv2.imread(str(image_path)),
                               cv2.COLOR_BGR2RGB)
            for x0, y0, x1, y1 in boxes:
                mask[y0:y1, x0:x1] = 0
                y0h = y0 + (y1 - y0) // 2
                roi = img[y0h:y1, x0:x1]
                dark = (roi < 96).all(axis=2)
                mask[y0h:y1, x0:x1][dark] = 1
            if dilate > 0:
                kernel = np.ones((dilate, dilate), np.uint8)
                mask = cv2.erode(mask, kernel)
        Image.fromarray(mask).save(mask_path)
        written += 1
    return written


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", type=Path, required=True)
    p.add_argument("--dilate", type=int, default=0)
    args = p.parse_args(argv)
    n = generate_masks(args.data, args.dilate)
    print(f"wrote {n} masks")


if __name__ == "__main__":
    main()
