"""Resave HIM2K / I-HIM50K instance-matting datasets into the universal
instance layout (<out>/<image_id>/image.jpg + instance_<k>.png alphas).

Parity with /root/reference/SimpleAICV/universal_segmentation/
universal_segmentation_dataset_preprocessing/{001.resave_him2k_dataset,
002.resave_i-him50k_dataset}.py: per-image instance alpha sets are paired
by directory, resized to a max side, degenerate instances dropped.
"""

import argparse
import os


def main():
    import cv2
    p = argparse.ArgumentParser(description="resave HIM2K-style datasets")
    p.add_argument("--image-dir", required=True)
    p.add_argument("--alpha-dir", required=True,
                   help="per-image subdirs of instance alpha pngs")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--max-side", type=float, default=1080.0)
    p.add_argument("--min-fg-pixels", type=int, default=100)
    args = p.parse_args()

    os.makedirs(args.output_dir, exist_ok=True)
    n_img = n_inst = 0
    for name in sorted(os.listdir(args.image_dir)):
        stem, ext = os.path.splitext(name)
        if ext.lower() not in (".jpg", ".jpeg", ".png"):
            continue
        inst_dir = os.path.join(args.alpha_dir, stem)
        if not os.path.isdir(inst_dir):
            continue
        img = cv2.imread(os.path.join(args.image_dir, name))
        if img is None:
            continue
        h, w = img.shape[:2]
        factor = min(args.max_side / max(h, w), 1.0)
        rw, rh = int(round(w * factor)), int(round(h * factor))
        img = cv2.resize(img, (rw, rh)) if factor < 1.0 else img
        out_dir = os.path.join(args.output_dir, stem)
        alphas = []
        for a_name in sorted(os.listdir(inst_dir)):
            a = cv2.imread(os.path.join(inst_dir, a_name),
                           cv2.IMREAD_GRAYSCALE)
            if a is None:
                continue
            if factor < 1.0:
                a = cv2.resize(a, (rw, rh))
            if int((a > 127).sum()) < args.min_fg_pixels:
                continue
            alphas.append(a)
        if not alphas:
            continue
        os.makedirs(out_dir, exist_ok=True)
        cv2.imwrite(os.path.join(out_dir, "image.jpg"), img)
        for k, a in enumerate(alphas):
            cv2.imwrite(os.path.join(out_dir, f"instance_{k}.png"), a)
        n_img += 1
        n_inst += len(alphas)
    print(f"resaved {n_img} images, {n_inst} instances")


if __name__ == "__main__":
    main()
