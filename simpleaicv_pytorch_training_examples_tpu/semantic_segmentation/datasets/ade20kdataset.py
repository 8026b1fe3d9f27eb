"""ADE20K semantic segmentation dataset.

Parity with /root/reference/SimpleAICV/semantic_segmentation/datasets/
ade20kdataset.py: images/ADEChallengeData2016 layout — images under
images/{training,validation}, per-pixel class png under
annotations/{training,validation} with 0=background/ignore, classes 1..150.
"""

import os

import numpy as np


class ADE20KSemanticSegmentation:

    def __init__(self, root_dir, image_sets="training", transform=None):
        assert image_sets in ("training", "validation")
        self.transform = transform
        image_dir = os.path.join(root_dir, "images", image_sets)
        mask_dir = os.path.join(root_dir, "annotations", image_sets)
        self.pairs = []
        # tolerate a missing dataset root (configs importable without data)
        names = sorted(os.listdir(image_dir)) if os.path.isdir(image_dir) \
            else []
        for name in names:
            if not name.endswith(".jpg"):
                continue
            mask_name = name.replace(".jpg", ".png")
            mask_path = os.path.join(mask_dir, mask_name)
            if os.path.exists(mask_path):
                self.pairs.append((os.path.join(image_dir, name), mask_path))

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, idx):
        import cv2
        image_path, mask_path = self.pairs[idx]
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
