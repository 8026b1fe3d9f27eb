"""Face parsing dataset (CelebAMask-HQ / FaceSynthetics preprocessed
layout).

Parity with /root/reference/SimpleAICV/face_parsing/datasets/
face_parsing_dataset.py: root/<set_name>/<set_type>/ with paired
image .jpg + per-pixel class .png masks.
"""

import os

import numpy as np


class FaceParsingDataset:

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
                mask_path = os.path.join(set_dir, mask_name)
                if os.path.exists(mask_path):
                    pairs[f"{set_name}/{name}"] = (
                        os.path.join(set_dir, name), mask_path)
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
