"""Salient-object detection folder-combine dataset.

Parity with /root/reference/SimpleAICV/salient_object_detection/datasets/
salient_object_detection_dataset.py: root/<set_name>/<set_type>/ holding
paired image.jpg + mask.png; multiple set_names merged and sorted.
"""

import os

import numpy as np


class SalientObjectDetectionDataset:

    def __init__(self, root_dir, set_name_list=(), set_type="train",
                 transform=None):
        self.transform = transform
        pairs = {}
        for set_name in set_name_list:
            set_dir = os.path.join(root_dir, set_name, set_type)
            if not os.path.isdir(set_dir):
                continue
            for name in os.listdir(set_dir):
                if not name.endswith(".jpg"):
                    continue
                mask_name = name.rsplit(".", 1)[0] + ".png"
                image_path = os.path.join(set_dir, name)
                mask_path = os.path.join(set_dir, mask_name)
                if os.path.exists(mask_path):
                    pairs[name] = (image_path, mask_path)
        self.names = sorted(pairs)
        self.pairs = pairs

    def __len__(self):
        return len(self.names)

    def __getitem__(self, idx):
        import cv2
        image_path, mask_path = self.pairs[self.names[idx]]
        image = cv2.cvtColor(cv2.imread(image_path), cv2.COLOR_BGR2RGB)
        mask = cv2.imread(mask_path, cv2.IMREAD_GRAYSCALE)
        sample = {
            "image": image.astype(np.float32),
            "mask": mask.astype(np.float32),
            "size": np.array(image.shape[:2], np.float32),
        }
        if self.transform is not None:
            sample = self.transform(sample)
        return sample
