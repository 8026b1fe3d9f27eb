"""SA-1B preprocessing: resave (downscale to a max side + rescale all
annotation geometry + re-encode RLE masks) and filter (drop no-object
images; drop part-object masks that are near-duplicates / contained parts
of a larger mask).

Consolidates /root/reference/SimpleAICV/interactive_segmentation/
interactive_segmentation_dataset_preprocessing/
{003.resave_sa_1b_image_json,004.filter_sa_1b_image_json,
005.filter_sa_1b_part_object,006.filter_sa_1b_part_object_image_json}.py
into one entry with --stage. pycocotools is replaced by the framework's
numpy RLE codec (detection/rle.py).

Usage:
  python sa1b_preprocessing.py --stage resave --input-dir ... --output-dir \
      ... [--max-side 1080] [--workers 8]
  python sa1b_preprocessing.py --stage filter --input-dir ... --output-dir \
      ... [--min-area 100] [--contain-recall 0.9] [--dup-iou 0.9]
"""

import argparse
import json
import os
import sys
from multiprocessing import Pool

import numpy as np

BASE_DIR = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
sys.path.append(BASE_DIR)

from simpleaicv_pytorch_training_examples_tpu.detection.rle import (  # noqa: E402
    coco_rle_to_mask, mask_to_coco_rle)


def _pairs(input_dir):
    for name in sorted(os.listdir(input_dir)):
        if not name.endswith(".jpg"):
            continue
        stem = name[:-4]
        json_path = os.path.join(input_dir, stem + ".json")
        if os.path.exists(json_path):
            yield stem, os.path.join(input_dir, name), json_path


def resave_one(args):
    stem, jpg_path, json_path, output_dir, max_side = args
    import cv2
    img = cv2.imread(jpg_path)
    if img is None:
        return 0
    h, w = img.shape[:2]
    factor = max_side / max(h, w)
    rh, rw = int(round(h * factor)), int(round(w * factor))
    img = cv2.resize(img, (rw, rh))
    with open(json_path, encoding="utf-8") as f:
        data = json.load(f)
    data["image"]["width"] = rw
    data["image"]["height"] = rh
    new_annots = []
    for a in data.get("annotations", []):
        a["bbox"] = [v * factor for v in a["bbox"]]
        if "point_coords" in a:
            a["point_coords"] = [[p[0] * factor, p[1] * factor]
                                 for p in a["point_coords"]]
        if "crop_box" in a:
            a["crop_box"] = [v * factor for v in a["crop_box"]]
        mask = coco_rle_to_mask(a["segmentation"])
        mask = cv2.resize(mask, (rw, rh),
                          interpolation=cv2.INTER_NEAREST)
        a["segmentation"] = mask_to_coco_rle(mask)
        a["area"] = int(mask.sum())
        if a["area"] > 0:
            new_annots.append(a)
    data["annotations"] = new_annots
    cv2.imwrite(os.path.join(output_dir, stem + ".jpg"), img)
    with open(os.path.join(output_dir, stem + ".json"), "w",
              encoding="utf-8") as f:
        json.dump(data, f)
    return len(new_annots)


def filter_one(args):
    """Drop tiny masks, masks duplicated by IoU, and part-object masks
    mostly contained in a larger mask (reference 005 recall rule)."""
    stem, jpg_path, json_path, output_dir, min_area, contain_recall, \
        dup_iou = args
    import cv2
    with open(json_path, encoding="utf-8") as f:
        data = json.load(f)
    annots = data.get("annotations", [])
    masks = []
    keep = []
    for a in annots:
        if a.get("area", 0) < min_area:
            continue
        masks.append(coco_rle_to_mask(a["segmentation"]).astype(bool))
        keep.append(a)
    order = np.argsort([-m.sum() for m in masks]) if masks else []
    final_idx = []
    for i in order:
        drop = False
        mi = masks[i]
        ai = mi.sum()
        for j in final_idx:
            inter = np.logical_and(mi, masks[j]).sum()
            union = np.logical_or(mi, masks[j]).sum()
            if union and inter / union > dup_iou:
                drop = True           # near-duplicate of a bigger mask
                break
            if ai and inter / ai > contain_recall:
                drop = True           # part of a bigger object
                break
        if not drop:
            final_idx.append(i)
    data["annotations"] = [keep[i] for i in sorted(final_idx)]
    if not data["annotations"]:
        return 0  # no-object image: skipped entirely (reference 004)
    img = cv2.imread(jpg_path)
    cv2.imwrite(os.path.join(output_dir, stem + ".jpg"), img)
    with open(os.path.join(output_dir, stem + ".json"), "w",
              encoding="utf-8") as f:
        json.dump(data, f)
    return len(data["annotations"])


def main():
    p = argparse.ArgumentParser(description="SA-1B preprocessing")
    p.add_argument("--stage", choices=("resave", "filter"), required=True)
    p.add_argument("--input-dir", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--max-side", type=float, default=1080.0)
    p.add_argument("--min-area", type=int, default=100)
    p.add_argument("--contain-recall", type=float, default=0.9)
    p.add_argument("--dup-iou", type=float, default=0.9)
    p.add_argument("--workers", type=int, default=8)
    args = p.parse_args()

    os.makedirs(args.output_dir, exist_ok=True)
    if args.stage == "resave":
        work = [(s, j, jp, args.output_dir, args.max_side)
                for s, j, jp in _pairs(args.input_dir)]
        fn = resave_one
    else:
        work = [(s, j, jp, args.output_dir, args.min_area,
                 args.contain_recall, args.dup_iou)
                for s, j, jp in _pairs(args.input_dir)]
        fn = filter_one
    with Pool(args.workers) as pool:
        counts = pool.map(fn, work)
    print(f"{args.stage}: {len(work)} images, "
          f"{int(np.sum(counts))} annotations kept")


if __name__ == "__main__":
    main()
