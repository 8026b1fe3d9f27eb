"""Resave + filter salient-object-detection and human-matting datasets
into the folder-combine layout this framework's datasets read
(<root>/<set_name>/<set_type>/ with image.jpg + mask.png pairs).

Consolidates /root/reference/SimpleAICV/interactive_segmentation/
interactive_segmentation_dataset_preprocessing/{001.resave...,
002.filter...}.py, human_matting/human_matting_dataset_preprocessing/
0.processing_matting_human_half_dataset.py and salient_object_detection/
salient_object_detection_dataset_preprocessing/0.processing_magick_dataset
.py: pair images with their masks/alphas by stem, resize to a max side,
drop pairs whose foreground is degenerate (too small / too large a
fraction of the image, the reference's filter rule).
"""

import argparse
import os

import numpy as np


def main():
    import cv2
    p = argparse.ArgumentParser(
        description="resave + filter SOD / matting datasets")
    p.add_argument("--image-dir", required=True)
    p.add_argument("--mask-dir", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--max-side", type=float, default=1080.0)
    p.add_argument("--min-fg-ratio", type=float, default=0.001)
    p.add_argument("--max-fg-ratio", type=float, default=0.95)
    p.add_argument("--mask-suffix", default=".png")
    args = p.parse_args()

    os.makedirs(args.output_dir, exist_ok=True)
    n_kept = n_total = 0
    for name in sorted(os.listdir(args.image_dir)):
        stem, ext = os.path.splitext(name)
        if ext.lower() not in (".jpg", ".jpeg", ".png"):
            continue
        mask_path = os.path.join(args.mask_dir, stem + args.mask_suffix)
        if not os.path.exists(mask_path):
            continue
        n_total += 1
        img = cv2.imread(os.path.join(args.image_dir, name))
        mask = cv2.imread(mask_path, cv2.IMREAD_GRAYSCALE)
        if img is None or mask is None:
            continue
        fg_ratio = float((mask > 127).mean())
        if not (args.min_fg_ratio <= fg_ratio <= args.max_fg_ratio):
            continue
        h, w = img.shape[:2]
        factor = min(args.max_side / max(h, w), 1.0)
        if factor < 1.0:
            rw, rh = int(round(w * factor)), int(round(h * factor))
            img = cv2.resize(img, (rw, rh))
            mask = cv2.resize(mask, (rw, rh),
                              interpolation=cv2.INTER_LINEAR)
        cv2.imwrite(os.path.join(args.output_dir, stem + ".jpg"), img)
        cv2.imwrite(os.path.join(args.output_dir, stem + ".png"), mask)
        n_kept += 1
    print(f"kept {n_kept}/{n_total} pairs")


if __name__ == "__main__":
    main()
