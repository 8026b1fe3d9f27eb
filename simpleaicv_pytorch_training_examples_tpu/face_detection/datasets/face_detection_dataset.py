"""Face detection dataset (WIDERFace-style preprocessed layout).

Parity with /root/reference/SimpleAICV/face_detection/datasets/
face_detection_dataset.py: root/<set_name>/<set_type>/ with images and a
per-image json of face boxes. Reuses detection transforms/collater
({'image','annots' [N,5] xyxy+class(0),'scale','size'}).
"""

import json
import os

import numpy as np


class FaceDetectionDataset:

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
        boxes = []
        for b in label.get("boxes", []):
            x1, y1, x2, y2 = b[:4]
            if x2 - x1 < 1 or y2 - y1 < 1:
                continue
            boxes.append([x1, y1, x2, y2, 0])
        annots = np.asarray(boxes, np.float32) if boxes else \
            np.zeros((0, 5), np.float32)
        sample = {
            "image": image,
            "annots": annots,
            "scale": np.float32(1.0),
            "size": np.array(image.shape[:2], np.float32),
        }
        if self.transform is not None:
            sample = self.transform(sample)
        return sample
