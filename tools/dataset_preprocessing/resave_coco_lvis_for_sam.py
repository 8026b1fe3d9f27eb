"""Resave COCO-format instance datasets (COCO2017 / SAMA-COCO / LVIS /
Objects365-instances) into the SA-1B-style SAM prompt-training layout.

Consolidates /root/reference/SimpleAICV/interactive_segmentation/
interactive_segmentation_dataset_preprocessing/{007.resave_coco2017_dataset,
008.resave_sama_coco_dataset,009.filter_coco2017_and_sama_coco_image_json,
010.resave_lvisv1.0_dataset,011.filter_lvis1.0_part_object,
012.filter_lvis1.0_image_json}.py into one parameterized entry.

Per image (reference semantics, 007...py:30-100 / 011...py:14-95):
- drop annotations flagged ``ignore``, with degenerate boxes (w/h <= 1 or
  no image overlap), or whose area ratio is below --min-area-ratio;
- rasterize polygon segmentations (cv2.fillPoly) or decode COCO RLE
  (detection/rle.py — pycocotools is not available here);
- deduplicate masks: IoU > --dup-iou keeps the larger one;
- drop part-object masks: a mask whose intersection-recall against a
  larger kept mask exceeds --contain-recall is a contained part;
- skip images left with no masks (the no-object filter);
- optionally downscale to --max-side (annotation geometry rescales with
  the image; masks are re-encoded after resize);
- write <out>/<set>/<type>/<stem>.jpg + <stem>.json with
  {"annotations": [{"segmentation": <compressed RLE>}, ...]} — exactly
  what SamSegmentationDataset's SA-1B json layout reads.

Usage:
  python resave_coco_lvis_for_sam.py --images <dir> \
      --annotations instances_train2017.json --output-dir out/coco/train \
      [--max-side 1080] [--min-area-ratio 0.0001] [--dup-iou 0.9] \
      [--contain-recall 0.9] [--limit N]
"""

import argparse
import json
import os
import sys

import numpy as np

BASE_DIR = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
sys.path.append(BASE_DIR)

from simpleaicv_pytorch_training_examples_tpu.detection.rle import (  # noqa: E402
    coco_rle_to_mask, mask_to_coco_rle, rle_decode)


def polygons_to_mask(polygons, h, w):
    import cv2
    mask = np.zeros((h, w), np.uint8)
    for poly in polygons:
        pts = np.asarray(poly, np.float64).reshape(-1, 2)
        cv2.fillPoly(mask, [np.round(pts).astype(np.int32)], 1)
    return mask


def annot_to_mask(annot, h, w):
    seg = annot.get("segmentation")
    if seg is None:
        return None
    if isinstance(seg, list):
        return polygons_to_mask(seg, h, w)
    if isinstance(seg, dict):
        counts = seg.get("counts")
        if isinstance(counts, str):
            return coco_rle_to_mask(seg)
        return rle_decode(seg)
    return None


def recall_iou(m1, m2):
    inter = np.count_nonzero(m1 & m2)
    a1, a2 = np.count_nonzero(m1), np.count_nonzero(m2)
    if a1 == 0 or a2 == 0:
        return 0.0, 0.0, 0.0
    union = a1 + a2 - inter
    return inter / a1, inter / a2, (inter / union if union else 0.0)


def filter_image_masks(masks, dup_iou, contain_recall):
    """Reference 011...py:63-95: sort by area desc; a new mask is dropped
    if it near-duplicates (IoU) or is a contained part (recall) of a kept
    larger mask."""
    order = sorted(range(len(masks)),
                   key=lambda i: -np.count_nonzero(masks[i]))
    keep = []
    for i in order:
        drop = False
        for j in keep:
            r_new, _, iou = recall_iou(masks[i], masks[j])
            if iou > dup_iou or r_new > contain_recall:
                drop = True
                break
        if not drop:
            keep.append(i)
    return sorted(keep)


def main():
    import cv2
    p = argparse.ArgumentParser(
        description="resave COCO-format datasets for SAM training")
    p.add_argument("--images", required=True)
    p.add_argument("--annotations", required=True,
                   help="COCO instances json")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--max-side", type=float, default=1080.0)
    p.add_argument("--min-area-ratio", type=float, default=0.0001)
    p.add_argument("--dup-iou", type=float, default=0.9)
    p.add_argument("--contain-recall", type=float, default=0.9)
    p.add_argument("--limit", type=int, default=0)
    args = p.parse_args()

    with open(args.annotations, encoding="utf-8") as f:
        coco = json.load(f)
    images = {im["id"]: im for im in coco["images"]}
    per_image = {}
    for a in coco["annotations"]:
        per_image.setdefault(a["image_id"], []).append(a)

    os.makedirs(args.output_dir, exist_ok=True)
    n_images, n_masks = 0, 0
    for image_id, annots in per_image.items():
        if args.limit and n_images >= args.limit:
            break
        info = images.get(image_id)
        if info is None:
            continue
        h, w = info["height"], info["width"]
        # LVIS stores a full coco_url instead of file_name
        file_name = info.get("file_name") or \
            info.get("coco_url", "").rsplit("/", 1)[-1]
        masks = []
        for a in annots:
            if a.get("ignore") or a.get("iscrowd"):
                continue
            x, y, bw, bh = a.get("bbox", (0, 0, 0, 0))
            inter_w = max(0.0, min(x + bw, w) - max(x, 0.0))
            inter_h = max(0.0, min(y + bh, h) - max(y, 0.0))
            if inter_w * inter_h == 0 or bw <= 1 or bh <= 1:
                continue
            mask = annot_to_mask(a, h, w)
            if mask is None:
                continue
            if np.count_nonzero(mask) / float(h * w) < args.min_area_ratio:
                continue
            masks.append(mask)
        if not masks:
            continue
        keep = filter_image_masks(masks, args.dup_iou, args.contain_recall)
        if not keep:
            continue
        path = os.path.join(args.images, file_name)
        image = cv2.imdecode(np.fromfile(path, np.uint8), cv2.IMREAD_COLOR)
        if image is None:
            continue
        scale = min(1.0, args.max_side / max(h, w))
        if scale < 1.0:
            image = cv2.resize(image, (round(w * scale), round(h * scale)))
        out_annots = []
        for i in keep:
            m = masks[i]
            if scale < 1.0:
                m = cv2.resize(m, (image.shape[1], image.shape[0]),
                               interpolation=cv2.INTER_NEAREST)
            out_annots.append({"segmentation": mask_to_coco_rle(m)})
        stem = os.path.splitext(file_name)[0]
        cv2.imwrite(os.path.join(args.output_dir, stem + ".jpg"), image)
        with open(os.path.join(args.output_dir, stem + ".json"), "w",
                  encoding="utf-8") as f:
            json.dump({"annotations": out_annots}, f)
        n_images += 1
        n_masks += len(out_annots)
    print(f"wrote {n_images} images, {n_masks} masks -> {args.output_dir}")


if __name__ == "__main__":
    main()
