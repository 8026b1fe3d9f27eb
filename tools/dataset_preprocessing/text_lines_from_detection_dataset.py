"""Crop rectified text-line images out of a text-DETECTION dataset to
build a text-RECOGNITION dataset (<out>/<set_type>/ with line crops +
labels.json mapping crop name -> transcript).

Consolidates /root/reference/SimpleAICV/text_recognition/
text_line_from_text_detection_dataset_processing/ (001-005 + the
rectification utilities): straight quads are perspective-rectified with
cv2.getPerspectiveTransform; curved polygons (>4 points) are rectified by
minAreaRect crop (the reference's curve pipeline uses TPS; min-area
rotation covers the same capability for training crops). Illegible
regions ('###') are skipped.

Usage:
  python text_lines_from_detection_dataset.py --input-dir det_out/train \
      --output-dir rec_out/train [--min-size 8]
"""

import argparse
import json
import os

import numpy as np


def rectify_quad(img, pts, out_h=48):
    import cv2
    pts = np.asarray(pts, np.float32)
    w_top = np.linalg.norm(pts[1] - pts[0])
    w_bot = np.linalg.norm(pts[2] - pts[3])
    h_l = np.linalg.norm(pts[3] - pts[0])
    h_r = np.linalg.norm(pts[2] - pts[1])
    w = max(int(round(max(w_top, w_bot))), 1)
    h = max(int(round(max(h_l, h_r))), 1)
    dst = np.array([[0, 0], [w, 0], [w, h], [0, h]], np.float32)
    m = cv2.getPerspectiveTransform(pts, dst)
    crop = cv2.warpPerspective(img, m, (w, h))
    scale = out_h / max(h, 1)
    return cv2.resize(crop, (max(int(round(w * scale)), 1), out_h))


def rectify_poly(img, pts, out_h=48):
    """Curved polygon (2N points: N along the top edge then N back along
    the bottom, the ArT/LSVT/total-text convention): unwarp piecewise —
    each (top_i, top_i+1, bot_i+1, bot_i) quad is perspective-rectified
    and the strips concatenate left-to-right (the reference's TPS curve
    pipeline produces the same straightened line up to resampling).
    Falls back to min-area-rect for odd point counts."""
    import cv2
    pts = np.asarray(pts, np.float32)
    n = len(pts)
    if n >= 6 and n % 2 == 0:
        half = n // 2
        top = pts[:half]
        bot = pts[half:][::-1]  # bottom runs right-to-left in the format
        strips = []
        for i in range(half - 1):
            quad = np.stack([top[i], top[i + 1], bot[i + 1], bot[i]])
            strip = rectify_quad(img, quad, out_h)
            if strip.shape[1] > 0:
                strips.append(strip)
        if strips:
            return np.concatenate(strips, axis=1)
    rect = cv2.minAreaRect(pts)
    box = cv2.boxPoints(rect)
    # order box points: top-left first (smallest x+y), clockwise
    order = np.argsort(box.sum(axis=1))
    tl = box[order[0]]
    rest = sorted([b for i, b in enumerate(box) if i != order[0]],
                  key=lambda p: np.arctan2(p[1] - tl[1], p[0] - tl[0]))
    quad = np.stack([tl] + rest)
    return rectify_quad(img, quad, out_h)


def main():
    import cv2
    p = argparse.ArgumentParser(description="crop text lines")
    p.add_argument("--input-dir", required=True,
                   help="a converted detection set dir (img + json)")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--out-height", type=int, default=48)
    p.add_argument("--min-size", type=int, default=8)
    args = p.parse_args()

    os.makedirs(args.output_dir, exist_ok=True)
    labels = {}
    n_img = 0
    for name in sorted(os.listdir(args.input_dir)):
        if not name.lower().endswith((".jpg", ".jpeg", ".png")):
            continue
        stem = os.path.splitext(name)[0]
        jp = os.path.join(args.input_dir, stem + ".json")
        if not os.path.exists(jp):
            continue
        img = cv2.imread(os.path.join(args.input_dir, name))
        if img is None:
            continue
        with open(jp, encoding="utf-8") as f:
            shapes = json.load(f).get("shapes", [])
        for k, s in enumerate(shapes):
            text = s.get("label", "")
            if not text or text == "###":
                continue
            pts = s["points"]
            crop = rectify_quad(img, pts, args.out_height) \
                if len(pts) == 4 else rectify_poly(img, pts,
                                                   args.out_height)
            if min(crop.shape[:2]) < args.min_size:
                continue
            crop_name = f"{stem}_line{k}.jpg"
            cv2.imwrite(os.path.join(args.output_dir, crop_name), crop)
            labels[crop_name] = text
        n_img += 1
    with open(os.path.join(args.output_dir, "labels.json"), "w",
              encoding="utf-8") as f:
        json.dump(labels, f, ensure_ascii=False)
    print(f"cropped {len(labels)} lines from {n_img} images")


if __name__ == "__main__":
    main()
