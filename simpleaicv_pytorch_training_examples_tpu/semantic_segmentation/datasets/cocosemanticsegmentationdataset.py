"""COCO semantic segmentation dataset.

Parity with /root/reference/SimpleAICV/semantic_segmentation/datasets/
cocosemanticsegmentationdataset.py: per-pixel class masks rasterized from
COCO instance polygons (class 0 = background, classes 1..80 in contiguous
category order).
"""

import json
import os

import numpy as np


class CocoSemanticSegmentation:

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
        self.cat_id_to_label = {cid: i + 1 for i, cid in enumerate(cat_ids)}
        self.num_classes = len(cat_ids) + 1  # + background
        self.image_infos = sorted(data["images"], key=lambda x: x["id"])
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
        mask = np.zeros((h, w), np.float32)
        for a in self.anns_by_image.get(info["id"], []):
            if a.get("iscrowd", 0) or not isinstance(
                    a.get("segmentation"), list):
                continue
            label = self.cat_id_to_label[a["category_id"]]
            for poly in a["segmentation"]:
                pts = np.asarray(poly, np.float64).reshape(-1, 2)
                cv2.fillPoly(mask, [pts.astype(np.int32)], float(label))
        sample = {"image": image, "mask": mask,
                  "size": np.array([h, w], np.float32)}
        if self.transform is not None:
            sample = self.transform(sample)
        return sample
