"""SAM matting dataset + collater.

Capability parity with /root/reference/SimpleAICV/interactive_segmentation/
datasets/sam_matting_dataset.py (1,211 LoC core mechanics): matting-style
image + alpha pairs, trimap derived by erosion/dilation, fg/bg composites,
plus SAM prompt synthesis (points / noisy box / noisy mask) on the
binarized alpha.
"""

import numpy as np

from ...human_matting.datasets.human_matting_dataset import (
    HumanMattingDataset)
from .sam_segmentation_dataset import (load_points, mask_to_box, noise_box,
                                       noise_mask)


class SAMMattingDataset(HumanMattingDataset):
    """Same disk layout as HumanMattingDataset; adds prompt synthesis in
    the collater below."""


class SAMMattingCollater:

    def __init__(self, resize=1024, n_points=9,
                 prompt_probs=(0.5, 0.25, 0.25)):
        self.resize = resize
        self.n_points = n_points
        self.prompt_probs = prompt_probs

    def __call__(self, samples):
        import cv2
        n = len(samples)
        r = self.resize
        rq = r // 4
        out = {
            "image": np.zeros((n, r, r, 3), np.float32),
            "mask": np.zeros((n, r, r), np.float32),
            "trimap": np.zeros((n, r, r), np.float32),
            "fg_map": np.zeros((n, r, r, 3), np.float32),
            "bg_map": np.zeros((n, r, r, 3), np.float32),
            "prompt_point": np.full((n, self.n_points, 3), -1.0,
                                    np.float32),
            "prompt_box": np.zeros((n, 4), np.float32),
            "prompt_box_valid": np.zeros((n,), np.float32),
            "prompt_mask": np.zeros((n, rq, rq, 1), np.float32),
            "prompt_mask_valid": np.zeros((n,), np.float32),
        }
        for i, s in enumerate(samples):
            img = s["image"]
            h, w = img.shape[:2]
            factor = r / max(h, w)
            rh, rw = int(round(h * factor)), int(round(w * factor))
            out["image"][i, :rh, :rw] = cv2.resize(img, (rw, rh))
            out["mask"][i, :rh, :rw] = cv2.resize(s["mask"], (rw, rh))
            out["trimap"][i, :rh, :rw] = cv2.resize(
                s["trimap"], (rw, rh), interpolation=cv2.INTER_NEAREST)
            out["fg_map"][i, :rh, :rw] = cv2.resize(s["fg_map"], (rw, rh))
            out["bg_map"][i, :rh, :rw] = cv2.resize(s["bg_map"], (rw, rh))

            binary = (out["mask"][i] > 0.5).astype(np.float32)
            ptype = np.random.choice(3, p=self.prompt_probs)
            if ptype == 0:
                k = np.random.randint(1, self.n_points + 1)
                pts = load_points(binary, k)
                out["prompt_point"][i, :k] = pts[:k]
            elif ptype == 1:
                box, ok = mask_to_box(binary)
                if ok:
                    out["prompt_box"][i] = noise_box(box, (r, r))
                    out["prompt_box_valid"][i] = 1.0
            else:
                small = cv2.resize(noise_mask(binary), (rq, rq))
                out["prompt_mask"][i, :, :, 0] = (small > 0.5).astype(
                    np.float32)
                out["prompt_mask_valid"][i] = 1.0
        return out
