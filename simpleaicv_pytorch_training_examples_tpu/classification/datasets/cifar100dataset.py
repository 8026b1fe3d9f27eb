"""CIFAR-100 dataset (python pickle format on disk).

Parity with /root/reference/SimpleAICV/classification/datasets/
cifar100dataset.py: reads root_dir/cifar-100-python/{train,test}, returns
dict samples {'image': HWC uint8->float32, 'label': int}.
"""

import os
import pickle

import numpy as np


class CIFAR100Dataset:

    def __init__(self, root_dir, set_name="train", transform=None):
        assert set_name in ("train", "test")
        self.transform = transform
        path = os.path.join(root_dir, "cifar-100-python", set_name)
        # tolerate a missing dataset root (configs importable without data)
        if os.path.exists(path):
            with open(path, "rb") as f:
                entry = pickle.load(f, encoding="bytes")
            data = entry[b"data"]
        else:
            entry = {b"fine_labels": []}
            data = np.zeros((0, 3072), np.uint8)
        self.images = data.reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        self.labels = np.asarray(entry[b"fine_labels"], dtype=np.int64)

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx):
        sample = {
            "image": self.images[idx].astype(np.float32),
            "label": int(self.labels[idx]),
        }
        if self.transform is not None:
            sample = self.transform(sample)
        return sample
