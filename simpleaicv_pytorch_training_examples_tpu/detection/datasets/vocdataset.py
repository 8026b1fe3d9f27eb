"""Pascal VOC detection dataset (XML annotations).

Parity with /root/reference/SimpleAICV/detection/datasets/vocdataset.py:
VOC2007+2012 trainval / VOC2007 test splits, XML boxes, difficult-flag
filtering (kept for eval, skipped for train when keep_difficult=False).
"""

import os
import xml.etree.ElementTree as ET

import numpy as np

VOC_CLASSES = [
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
]


class VocDetection:

    def __init__(self, root_dir, image_sets=(("2007", "trainval"),
                                             ("2012", "trainval")),
                 transform=None, keep_difficult=False):
        self.transform = transform
        self.keep_difficult = keep_difficult
        self.class_to_idx = {c: i for i, c in enumerate(VOC_CLASSES)}
        self.idx_to_class = {i: c for c, i in self.class_to_idx.items()}
        self.ids = []
        for year, split in image_sets:
            base = os.path.join(root_dir, f"VOC{year}")
            list_file = os.path.join(base, "ImageSets", "Main",
                                     f"{split}.txt")
            if not os.path.exists(list_file):
                continue
            with open(list_file) as f:
                for line in f:
                    self.ids.append((base, line.strip()))

    def __len__(self):
        return len(self.ids)

    def parse_annotation(self, idx):
        base, image_id = self.ids[idx]
        tree = ET.parse(os.path.join(base, "Annotations",
                                     f"{image_id}.xml"))
        boxes, difficulties = [], []
        for obj in tree.findall("object"):
            difficult = int(obj.find("difficult").text or 0)
            if difficult and not self.keep_difficult:
                continue
            name = obj.find("name").text.lower().strip()
            bbox = obj.find("bndbox")
            box = [float(bbox.find(k).text) - 1
                   for k in ("xmin", "ymin", "xmax", "ymax")]
            boxes.append(box + [self.class_to_idx[name]])
            difficulties.append(difficult)
        return (np.asarray(boxes, np.float32) if boxes else
                np.zeros((0, 5), np.float32)), difficulties

    def __getitem__(self, idx):
        import cv2
        base, image_id = self.ids[idx]
        image = cv2.cvtColor(
            cv2.imread(os.path.join(base, "JPEGImages",
                                    f"{image_id}.jpg")),
            cv2.COLOR_BGR2RGB).astype(np.float32)
        annots, _ = self.parse_annotation(idx)
        sample = {
            "image": image,
            "annots": annots,
            "scale": np.float32(1.0),
            "size": np.array(image.shape[:2], np.float32),
        }
        if self.transform is not None:
            sample = self.transform(sample)
        return sample
