"""COCO instance segmentation dataset (polygon -> mask via cv2.fillPoly).

Parity with /root/reference/SimpleAICV/instance_segmentation/datasets/
cocodataset.py: boxes xyxy + class, per-instance binary masks rasterized
from polygon segmentations (RLE crowd annotations skipped, as in the
reference's polygon path).
"""

import json
import os

import numpy as np


class CocoInstanceSegmentation:

    def __init__(self, root_dir, set_name="train2017", transform=None,
                 max_instances=36):
        self.transform = transform
        self.max_instances = max_instances
        self.image_dir = os.path.join(root_dir, "images", set_name)
        if not os.path.exists(self.image_dir):
            self.image_dir = os.path.join(root_dir, set_name)
        ann_file = os.path.join(root_dir, "annotations",
                                f"instances_{set_name}.json")
        # tolerate a missing dataset root (configs importable without data)
        if os.path.exists(ann_file):
            with open(ann_file) as f:
                data = json.load(f)
        else:
            data = {"categories": [], "images": [], "annotations": []}
        cat_ids = sorted(c["id"] for c in data["categories"])
        self.cat_id_to_label = {cid: i for i, cid in enumerate(cat_ids)}
        self.label_to_cat_id = {i: c for c, i in self.cat_id_to_label.items()}
        self.image_infos = sorted(data["images"], key=lambda x: x["id"])
        self.image_ids = [im["id"] for im in self.image_infos]
        anns = {}
        for a in data.get("annotations", []):
            anns.setdefault(a["image_id"], []).append(a)
        self.anns_by_image = anns

    def __len__(self):
        return len(self.image_infos)

    def __getitem__(self, idx):
        import cv2
        info = self.image_infos[idx]
        path = os.path.join(self.image_dir, info["file_name"])
        image = cv2.cvtColor(
            cv2.imdecode(np.fromfile(path, np.uint8), cv2.IMREAD_COLOR),
            cv2.COLOR_BGR2RGB).astype(np.float32)
        h, w = image.shape[:2]

        boxes, masks = [], []
        for a in self.anns_by_image.get(info["id"], []):
            if a.get("iscrowd", 0) or not isinstance(
                    a.get("segmentation"), list):
                continue
            x, y, bw, bh = a["bbox"]
            if bw < 1 or bh < 1:
                continue
            mask = np.zeros((h, w), np.uint8)
            for poly in a["segmentation"]:
                pts = np.asarray(poly, np.float64).reshape(-1, 2)
                cv2.fillPoly(mask, [pts.astype(np.int32)], 1)
            boxes.append([x, y, x + bw, y + bh,
                          self.cat_id_to_label[a["category_id"]]])
            masks.append(mask.astype(np.float32))
            if len(boxes) >= self.max_instances:
                break

        if boxes:
            annots = np.asarray(boxes, np.float32)
            masks = np.stack(masks, axis=-1)  # [H,W,N]
        else:
            annots = np.zeros((0, 5), np.float32)
            masks = np.zeros((h, w, 0), np.float32)

        sample = {
            "image": image,
            "annots": annots,
            "mask": masks,
            "scale": np.float32(1.0),
            "size": np.array([h, w], np.float32),
        }
        if self.transform is not None:
            sample = self.transform(sample)
        return sample
