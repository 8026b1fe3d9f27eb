"""Text recognition dataset.

Parity with /root/reference/SimpleAICV/text_recognition/datasets/
text_recognition_dataset.py: root/<set_name>/<set_type>/ with text-line
crops and a labels.json mapping image name -> transcript.
"""

import json
import os

import numpy as np


class TextRecognition:

    def __init__(self, root_dir, set_name_list=(), set_type="train",
                 transform=None):
        self.transform = transform
        entries = []
        for set_name in set_name_list:
            set_dir = os.path.join(root_dir, set_name, set_type)
            label_path = os.path.join(set_dir, "labels.json")
            if not os.path.exists(label_path):
                continue
            with open(label_path, encoding="utf-8") as f:
                labels = json.load(f)
            for name, text in sorted(labels.items()):
                path = os.path.join(set_dir, name)
                if os.path.exists(path):
                    entries.append((path, text))
        self.entries = entries

    def __len__(self):
        return len(self.entries)

    def __getitem__(self, idx):
        import cv2
        path, text = self.entries[idx]
        image = cv2.cvtColor(cv2.imread(path),
                             cv2.COLOR_BGR2RGB).astype(np.float32)
        sample = {"image": image, "label": text}
        if self.transform is not None:
            sample = self.transform(sample)
        return sample
