"""Text detection dataset.

Parity with /root/reference/SimpleAICV/text_detection/datasets/
text_detection_dataset.py: root/<set_name>/<set_type>/ with images and a
per-image json label carrying polygon point lists and '###' illegible
flags (the reference's preprocessed format). Sample:
{'image', 'annots': {'boxes': [poly...], 'ignores': [bool...]}, 'size'}.
"""

import json
import os

import numpy as np


class TextDetection:

    def __init__(self, root_dir, set_name_list=(), set_type="train",
                 transform=None):
        self.transform = transform
        entries = {}
        for set_name in set_name_list:
            set_dir = os.path.join(root_dir, set_name, set_type)
            if not os.path.isdir(set_dir):
                continue
            for name in os.listdir(set_dir):
                if not name.endswith(".jpg"):
                    continue
                label_path = os.path.join(
                    set_dir, name.rsplit(".", 1)[0] + ".json")
                if os.path.exists(label_path):
                    entries[f"{set_name}/{name}"] = (
                        os.path.join(set_dir, name), label_path)
        self.names = sorted(entries)
        self.entries = entries

    def __len__(self):
        return len(self.names)

    def __getitem__(self, idx):
        import cv2
        image_path, label_path = self.entries[self.names[idx]]
        image = cv2.cvtColor(cv2.imread(image_path),
                             cv2.COLOR_BGR2RGB).astype(np.float32)
        with open(label_path) as f:
            label = json.load(f)
        boxes, ignores = [], []
        for shape in label.get("shapes", label.get("annotations", [])):
            pts = np.asarray(shape["points"], np.float32)
            text = shape.get("label", shape.get("text", ""))
            boxes.append(pts)
            ignores.append(text == "###")
        sample = {
            "image": image,
            "annots": {"boxes": boxes, "ignores": ignores},
            "size": np.array(image.shape[:2], np.float32),
        }
        if self.transform is not None:
            sample = self.transform(sample)
        return sample
