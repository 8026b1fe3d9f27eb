"""Objects365 detection dataset.

Parity with /root/reference/SimpleAICV/detection/datasets/
objects365dataset.py: Objects365 ships COCO-format instance json
(zhiyuan_objv2_*.json), so this is the COCO parser pointed at the
Objects365 layout.
"""

import os

from .cocodataset import CocoDetection


class Objects365Detection(CocoDetection):

    def __init__(self, root_dir, set_name="train", transform=None):
        # map objects365 layout onto the COCO parser
        self.transform = transform
        ann_file = os.path.join(root_dir, "annotations",
                                f"zhiyuan_objv2_{set_name}.json")
        if not os.path.exists(ann_file):
            ann_file = os.path.join(root_dir, "annotations",
                                    f"instances_{set_name}.json")
        import json
        # tolerate a missing dataset root (configs importable without data)
        if os.path.exists(ann_file):
            with open(ann_file) as f:
                data = json.load(f)
        else:
            data = {"categories": [], "images": [], "annotations": []}
        self.image_dir = os.path.join(root_dir, "images", set_name)
        cat_ids = sorted(c["id"] for c in data["categories"])
        self.cat_id_to_label = {cid: i for i, cid in enumerate(cat_ids)}
        self.label_to_cat_id = {i: c for c, i in
                                self.cat_id_to_label.items()}
        self.num_classes = len(cat_ids)
        self.cat_names = {c["id"]: c["name"] for c in data["categories"]}
        self.image_infos = sorted(data["images"], key=lambda x: x["id"])
        self.image_ids = [im["id"] for im in self.image_infos]
        anns = {}
        for a in data.get("annotations", []):
            anns.setdefault(a["image_id"], []).append(a)
        self.anns_by_image = anns
