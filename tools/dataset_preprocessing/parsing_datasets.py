"""Convert face/human parsing datasets into the framework's
image.jpg + mask.png (per-pixel class label) layout.

Consolidates /root/reference/SimpleAICV/face_parsing/
face_parsing_dataset_processing/{0.processing_FaceSynthetics,
1.processing_CelebAMask-HQ}.py and human_parsing/
human_parsing_dataset_processing/{0.processing_LIP,1.processing_CIHP}.py:

- celebamask: CelebAMask-HQ ships one binary PNG per facial part per
  image; they are merged into one label map (part order = class id+1,
  later parts overwrite earlier, 255 -> background) — the reference's
  exact merge rule.
- pairs: LIP / CIHP / FaceSynthetics already ship label-map PNGs; images
  and masks are paired by stem, re-encoded and (optionally) resized.

Usage:
  python parsing_datasets.py --format celebamask --image-dir CelebA-HQ-img
      --mask-dir CelebAMask-HQ-mask-anno --output-dir out
  python parsing_datasets.py --format pairs --image-dir imgs
      --mask-dir labels --output-dir out [--max-side 1080]
"""

import argparse
import os

import numpy as np

CELEBAMASK_PARTS = [
    "skin", "l_brow", "r_brow", "l_eye", "r_eye", "eye_g", "l_ear",
    "r_ear", "ear_r", "nose", "mouth", "u_lip", "l_lip", "neck",
    "neck_l", "cloth", "hair", "hat",
]


def convert_celebamask(image_dir, mask_dir, output_dir):
    import cv2
    os.makedirs(output_dir, exist_ok=True)
    # part masks are sharded into numbered subdirs; index them once
    part_paths = {}
    for root, _, files in os.walk(mask_dir):
        for f in files:
            if f.endswith(".png"):
                part_paths[f] = os.path.join(root, f)
    n = 0
    for name in sorted(os.listdir(image_dir)):
        stem, ext = os.path.splitext(name)
        if ext.lower() not in (".jpg", ".jpeg", ".png"):
            continue
        img = cv2.imread(os.path.join(image_dir, name))
        if img is None:
            continue
        mask = np.zeros(img.shape[:2], np.uint8)
        prefix = stem.rjust(5, "0")
        found = False
        for ci, part in enumerate(CELEBAMASK_PARTS):
            pp = part_paths.get(f"{prefix}_{part}.png")
            if pp is None:
                continue
            pm = cv2.imread(pp, cv2.IMREAD_GRAYSCALE)
            if pm is None:
                continue
            if pm.shape != mask.shape:
                pm = cv2.resize(pm, (mask.shape[1], mask.shape[0]),
                                interpolation=cv2.INTER_NEAREST)
            mask[pm != 0] = ci + 1
            found = True
        if not found:
            continue
        cv2.imwrite(os.path.join(output_dir, stem + ".jpg"), img)
        cv2.imwrite(os.path.join(output_dir, stem + ".png"), mask)
        n += 1
    print(f"celebamask: merged {n} images "
          f"({len(CELEBAMASK_PARTS) + 1} classes incl. background)")


def convert_pairs(image_dir, mask_dir, output_dir, max_side=0):
    import cv2
    os.makedirs(output_dir, exist_ok=True)
    n = 0
    for name in sorted(os.listdir(image_dir)):
        stem, ext = os.path.splitext(name)
        if ext.lower() not in (".jpg", ".jpeg", ".png"):
            continue
        mp = os.path.join(mask_dir, stem + ".png")
        if not os.path.exists(mp):
            continue
        img = cv2.imread(os.path.join(image_dir, name))
        mask = cv2.imread(mp, cv2.IMREAD_GRAYSCALE)
        if img is None or mask is None:
            continue
        if max_side:
            h, w = img.shape[:2]
            f = min(max_side / max(h, w), 1.0)
            if f < 1.0:
                rw, rh = int(round(w * f)), int(round(h * f))
                img = cv2.resize(img, (rw, rh))
                mask = cv2.resize(mask, (rw, rh),
                                  interpolation=cv2.INTER_NEAREST)
        cv2.imwrite(os.path.join(output_dir, stem + ".jpg"), img)
        cv2.imwrite(os.path.join(output_dir, stem + ".png"), mask)
        n += 1
    print(f"pairs: converted {n} image/mask pairs")


def main():
    p = argparse.ArgumentParser(description="convert parsing datasets")
    p.add_argument("--format", required=True,
                   choices=("celebamask", "pairs"))
    p.add_argument("--image-dir", required=True)
    p.add_argument("--mask-dir", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--max-side", type=float, default=0)
    args = p.parse_args()
    if args.format == "celebamask":
        convert_celebamask(args.image_dir, args.mask_dir, args.output_dir)
    else:
        convert_pairs(args.image_dir, args.mask_dir, args.output_dir,
                      args.max_side)


if __name__ == "__main__":
    main()
