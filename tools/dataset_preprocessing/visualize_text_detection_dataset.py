"""Visualize a converted text-detection dataset: draw the polygon
annotations ('###' illegible regions in red, labeled text in green) on a
sample of images.

Parity with /root/reference/SimpleAICV/text_detection/
text_detection_dataset_processing/000.text_detection_dataset_
visualization.py.

Usage:
  python visualize_text_detection_dataset.py --input-dir det/train \
      --output-dir vis [--limit 20]
"""

import argparse
import json
import os

import numpy as np


def main():
    import cv2
    p = argparse.ArgumentParser(description="visualize text detection set")
    p.add_argument("--input-dir", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--limit", type=int, default=20)
    args = p.parse_args()

    os.makedirs(args.output_dir, exist_ok=True)
    n = 0
    for name in sorted(os.listdir(args.input_dir)):
        if not name.lower().endswith((".jpg", ".jpeg", ".png")):
            continue
        if n >= args.limit:
            break
        stem = os.path.splitext(name)[0]
        jp = os.path.join(args.input_dir, stem + ".json")
        if not os.path.exists(jp):
            continue
        img = cv2.imread(os.path.join(args.input_dir, name))
        if img is None:
            continue
        with open(jp, encoding="utf-8") as f:
            shapes = json.load(f).get("shapes", [])
        for s in shapes:
            pts = np.round(np.asarray(s["points"])).astype(np.int32)
            color = (0, 0, 255) if s.get("label") == "###" else (0, 255, 0)
            cv2.polylines(img, [pts], True, color, 2)
        cv2.imwrite(os.path.join(args.output_dir, name), img)
        n += 1
    print(f"visualized {n} images -> {args.output_dir}")


if __name__ == "__main__":
    main()
