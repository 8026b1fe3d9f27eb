"""ILSVRC2012 (ImageNet-1K) folder-per-class dataset.

Parity with /root/reference/SimpleAICV/classification/datasets/
ilsvrc2012dataset.py:10-80: root_dir/{train,val}/<wnid>/*.JPEG, labels from
sorted class-dir order, cv2 BGR->RGB decode.
"""

import os

import numpy as np


class ILSVRC2012Dataset:

    def __init__(self, root_dir, set_name="train", transform=None):
        assert set_name in ("train", "val")
        self.transform = transform
        set_dir = os.path.join(root_dir, set_name)
        # tolerate a missing dataset root: configs must stay importable on
        # machines without the data (the loader errors on first use)
        class_names = sorted(os.listdir(set_dir)) \
            if os.path.isdir(set_dir) else []
        self.class_to_idx = {c: i for i, c in enumerate(class_names)}
        self.image_paths = []
        self.labels = []
        for cls in class_names:
            cls_dir = os.path.join(set_dir, cls)
            if not os.path.isdir(cls_dir):
                continue
            for name in sorted(os.listdir(cls_dir)):
                self.image_paths.append(os.path.join(cls_dir, name))
                self.labels.append(self.class_to_idx[cls])
        self.labels = np.asarray(self.labels, dtype=np.int64)

    def __len__(self):
        return len(self.image_paths)

    def __getitem__(self, idx):
        # native libjpeg decode (GIL-free, DCT prescale) with cv2 fallback
        # for non-JPEG files — data/native_jpeg.py
        from ...data.native_jpeg import decode_jpeg
        image = decode_jpeg(self.image_paths[idx])
        if image is None:
            import cv2
            data = np.fromfile(self.image_paths[idx], dtype=np.uint8)
            image = cv2.cvtColor(cv2.imdecode(data, cv2.IMREAD_COLOR),
                                 cv2.COLOR_BGR2RGB)
        # stays uint8 through crop/resize/augment — torchvision's PIL
        # pipeline is uint8 until ToTensor too, and the float conversion
        # belongs to TorchMeanStdNormalize (fused there); decode-size
        # float32 conversion + float resize cost ~1.5 ms/img of the host
        # budget (tools/perf/loader_bench.py)
        sample = {"image": image, "label": int(self.labels[idx])}
        if self.transform is not None:
            sample = self.transform(sample)
        return sample
