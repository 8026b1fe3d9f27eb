"""COCO detection dataset (stdlib-json parser; no pycocotools needed).

Parity with /root/reference/SimpleAICV/detection/datasets/cocodataset.py:46
(CocoDetection): root/images/{set}2017 + annotations/instances_{set}2017.json,
bbox xywh->xyxy, the 80 categories mapped to contiguous 0..79 in ascending
category-id order, degenerate boxes (w/h < 1) dropped. pycocotools is not
available in this environment, so the json is parsed directly — same data.
"""

import json
import os

import numpy as np


class CocoDetection:

    def __init__(self, root_dir, set_name="train2017", transform=None):
        self.transform = transform
        self.image_dir = os.path.join(root_dir, "images", set_name)
        if not os.path.exists(self.image_dir):
            self.image_dir = os.path.join(root_dir, set_name)
        ann_file = os.path.join(root_dir, "annotations",
                                f"instances_{set_name}.json")
        # tolerate a missing dataset root: configs must stay importable on
        # machines without the data (the loader errors on first use)
        if os.path.exists(ann_file):
            with open(ann_file) as f:
                data = json.load(f)
        else:
            data = {"categories": [], "images": [], "annotations": []}

        cat_ids = sorted(c["id"] for c in data["categories"])
        self.cat_id_to_label = {cid: i for i, cid in enumerate(cat_ids)}
        self.label_to_cat_id = {i: cid for cid, i in
                                self.cat_id_to_label.items()}
        self.num_classes = len(cat_ids)
        self.cat_names = {c["id"]: c["name"] for c in data["categories"]}

        self.image_infos = sorted(data["images"], key=lambda x: x["id"])
        self.image_ids = [im["id"] for im in self.image_infos]
        anns_by_image = {}
        for ann in data.get("annotations", []):
            anns_by_image.setdefault(ann["image_id"], []).append(ann)
        self.anns_by_image = anns_by_image

    def __len__(self):
        return len(self.image_infos)

    def load_annots(self, idx):
        info = self.image_infos[idx]
        anns = self.anns_by_image.get(info["id"], [])
        out = []
        for a in anns:
            x, y, w, h = a["bbox"]
            if w < 1 or h < 1:
                continue
            out.append([x, y, x + w, y + h,
                        self.cat_id_to_label[a["category_id"]]])
        if not out:
            return np.zeros((0, 5), np.float32)
        return np.asarray(out, np.float32)

    def __getitem__(self, idx):
        import cv2
        info = self.image_infos[idx]
        path = os.path.join(self.image_dir, info["file_name"])
        image = cv2.imdecode(np.fromfile(path, dtype=np.uint8),
                             cv2.IMREAD_COLOR)
        image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB).astype(np.float32)
        sample = {
            "image": image,
            "annots": self.load_annots(idx),
            "scale": np.float32(1.0),
            "size": np.array(image.shape[:2], np.float32),
            "image_id": info["id"],
        }
        if self.transform is not None:
            sample = self.transform(sample)
        return sample
