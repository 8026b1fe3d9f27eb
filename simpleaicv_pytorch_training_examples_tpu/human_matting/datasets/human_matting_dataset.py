"""Human matting dataset.

Parity with /root/reference/SimpleAICV/human_matting/datasets/
human_matting_dataset.py: root/<set_name>/<set_type>/ with paired
image.jpg + alpha mask.png; trimap derived from alpha by erosion/dilation
of the 0/1 regions (unknown band = 128); fg/bg maps composited from the
image and alpha.
"""

import os

import numpy as np


class HumanMattingDataset:

    def __init__(self, root_dir, set_name_list=(), set_type="train",
                 transform=None, kernel_size_range=(10, 20)):
        self.transform = transform
        self.kernel_size_range = kernel_size_range
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
                    pairs[name] = (os.path.join(set_dir, name), mask_path)
        self.names = sorted(pairs)
        self.pairs = pairs

    def __len__(self):
        return len(self.names)

    def _make_trimap(self, alpha):
        import cv2
        k = np.random.randint(*self.kernel_size_range)
        kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (k, k))
        fg = (alpha > 0.95).astype(np.uint8)
        unknown = ((alpha > 0.05) & (alpha <= 0.95)).astype(np.uint8)
        fg_eroded = cv2.erode(fg, kernel)
        unknown_dilated = cv2.dilate(unknown | (fg - fg_eroded), kernel)
        trimap = np.zeros_like(alpha, np.float32)
        trimap[fg_eroded > 0] = 255.0
        trimap[unknown_dilated > 0] = 128.0
        trimap[fg_eroded > 0] = 255.0
        return trimap

    def __getitem__(self, idx):
        import cv2
        image_path, mask_path = self.pairs[self.names[idx]]
        image = cv2.cvtColor(cv2.imread(image_path),
                             cv2.COLOR_BGR2RGB).astype(np.float32)
        alpha = cv2.imread(mask_path, cv2.IMREAD_GRAYSCALE).astype(
            np.float32) / 255.0
        trimap = self._make_trimap(alpha)
        fg_map = image * alpha[..., None]
        bg_map = image * (1.0 - alpha[..., None])
        sample = {
            "image": image,
            "mask": alpha,
            "trimap": trimap,
            "fg_map": fg_map,
            "bg_map": bg_map,
            "size": np.array(image.shape[:2], np.float32),
        }
        if self.transform is not None:
            sample = self.transform(sample)
        return sample
