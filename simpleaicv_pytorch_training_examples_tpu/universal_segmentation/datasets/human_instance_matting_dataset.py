"""Human instance-matting dataset (HIM2K / I-HIM50K resave layout).

Parity with /root/reference/SimpleAICV/universal_segmentation/datasets/
human_instance_matting_dataset.py: one directory per image holding
image.jpg + instance_<k>.png per-instance alphas (the layout produced by
tools/dataset_preprocessing/resave_him2k_datasets.py).
"""

import os

import numpy as np

__all__ = ["HumanInstanceMattingDataset",
           "UniversalInstanceMattingCollater"]


class HumanInstanceMattingDataset:

    def __init__(self, root_dir, set_name_list=(), set_type="train",
                 transform=None, max_instances=8):
        self.transform = transform
        self.max_instances = max_instances
        self.entries = []
        for set_name in set_name_list:
            set_dir = os.path.join(root_dir, set_name, set_type)
            if not os.path.isdir(set_dir):
                continue
            for image_id in sorted(os.listdir(set_dir)):
                d = os.path.join(set_dir, image_id)
                if os.path.isfile(os.path.join(d, "image.jpg")):
                    self.entries.append(d)

    def __len__(self):
        return len(self.entries)

    def __getitem__(self, idx):
        import cv2
        d = self.entries[idx]
        image = cv2.cvtColor(cv2.imread(os.path.join(d, "image.jpg")),
                             cv2.COLOR_BGR2RGB).astype(np.float32)
        alphas = []
        for name in sorted(os.listdir(d)):
            if name.startswith("instance_") and name.endswith(".png"):
                a = cv2.imread(os.path.join(d, name),
                               cv2.IMREAD_GRAYSCALE)
                if a is not None:
                    alphas.append(a.astype(np.float32) / 255.0)
        sample = {"image": image,
                  "alphas": alphas[:self.max_instances]}
        if self.transform is not None:
            sample = self.transform(sample)
        return sample


class UniversalInstanceMattingCollater:
    """Fixed-shape instance alphas: gt_classes [B,M] (1=person, -1 pad) +
    gt_alphas [B,M,R,R]."""

    def __init__(self, resize=512, max_instances=8):
        self.resize = resize
        self.max_instances = max_instances

    def __call__(self, samples):
        import cv2
        n = len(samples)
        r = self.resize
        images = np.zeros((n, r, r, 3), np.float32)
        gt_classes = np.full((n, self.max_instances), -1.0, np.float32)
        gt_alphas = np.zeros((n, self.max_instances, r, r), np.float32)
        for i, s in enumerate(samples):
            img = s["image"]
            h, w = img.shape[:2]
            factor = r / max(h, w)
            rh, rw = int(round(h * factor)), int(round(w * factor))
            images[i, :rh, :rw] = cv2.resize(img, (rw, rh)) / 255.0
            for k, a in enumerate(s["alphas"][:self.max_instances]):
                gt_classes[i, k] = 0.0  # single 'person' class
                gt_alphas[i, k, :rh, :rw] = cv2.resize(a, (rw, rh))
        return {"image": images, "gt_classes": gt_classes,
                "gt_alphas": gt_alphas}
