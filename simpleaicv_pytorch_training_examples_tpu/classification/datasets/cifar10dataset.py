"""CIFAR-10 dataset (python pickle format on disk).

Parity with /root/reference/SimpleAICV/classification/datasets/
cifar10dataset.py.
"""

import os
import pickle

import numpy as np


class CIFAR10Dataset:

    def __init__(self, root_dir, set_name="train", transform=None):
        assert set_name in ("train", "test")
        self.transform = transform
        base = os.path.join(root_dir, "cifar-10-batches-py")
        files = ([f"data_batch_{i}" for i in range(1, 6)]
                 if set_name == "train" else ["test_batch"])
        images, labels = [], []
        for name in files:
            path = os.path.join(base, name)
            if not os.path.exists(path):
                continue  # missing data root: stay importable
            with open(path, "rb") as f:
                entry = pickle.load(f, encoding="bytes")
            images.append(entry[b"data"])
            labels.extend(entry[b"labels"])
        data = np.concatenate(images) if images else np.zeros(
            (0, 3072), np.uint8)
        self.images = data.reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        self.labels = np.asarray(labels, dtype=np.int64)

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
