"""SAM2 video segmentation dataset + collater.

Capability parity with /root/reference/SimpleAICV/
video_interactive_segmentation/datasets/
sam2_video_segmentation_dataset.py:28-2069 (core mechanics): video clips of
T frames with per-frame masks for one tracked object, frame-0 point-prompt
synthesis; image datasets can be mixed in as 1-frame clips.

Disk layout: root/<set_name>/<set_type>/<video_id>/ with 00000.jpg ... and
00000_mask.png ... per frame.
"""

import os

import numpy as np

from ...interactive_segmentation.datasets.sam_segmentation_dataset import (
    load_points)


class SAM2VideoSegmentationDataset:

    def __init__(self, root_dir, set_name_list=(), set_type="train",
                 frame_nums=8, transform=None):
        self.transform = transform
        self.frame_nums = frame_nums
        self.videos = []
        for set_name in set_name_list:
            set_dir = os.path.join(root_dir, set_name, set_type)
            if not os.path.isdir(set_dir):
                continue
            for vid in sorted(os.listdir(set_dir)):
                vdir = os.path.join(set_dir, vid)
                if not os.path.isdir(vdir):
                    continue
                frames = sorted(n for n in os.listdir(vdir)
                                if n.endswith(".jpg"))
                if len(frames) >= 1:
                    self.videos.append((vdir, frames))

    def __len__(self):
        return len(self.videos)

    def __getitem__(self, idx):
        import cv2
        vdir, frames = self.videos[idx]
        t = self.frame_nums
        if len(frames) >= t:
            start = np.random.randint(0, len(frames) - t + 1)
            chosen = frames[start:start + t]
        else:
            chosen = frames + [frames[-1]] * (t - len(frames))
        images, masks = [], []
        for name in chosen:
            img = cv2.cvtColor(cv2.imread(os.path.join(vdir, name)),
                               cv2.COLOR_BGR2RGB).astype(np.float32)
            mask_path = os.path.join(vdir,
                                     name.rsplit(".", 1)[0] + "_mask.png")
            if os.path.exists(mask_path):
                m = (cv2.imread(mask_path, cv2.IMREAD_GRAYSCALE) >
                     127).astype(np.float32)
            else:
                m = np.zeros(img.shape[:2], np.float32)
            images.append(img)
            masks.append(m)
        sample = {"images": images, "masks": masks}
        if self.transform is not None:
            sample = self.transform(sample)
        return sample


class SAM2VideoCollater:
    """Fixed-shape video batch + frame-0 point prompt synthesis."""

    def __init__(self, resize=1024, frame_nums=8, n_points=2):
        self.resize = resize
        self.frame_nums = frame_nums
        self.n_points = n_points

    def __call__(self, samples):
        import cv2
        n = len(samples)
        r = self.resize
        t = self.frame_nums
        images = np.zeros((n, t, r, r, 3), np.float32)
        masks = np.zeros((n, t, r, r), np.float32)
        points = np.full((n, self.n_points, 3), -1.0, np.float32)
        for i, s in enumerate(samples):
            for f, (img, m) in enumerate(zip(s["images"][:t],
                                             s["masks"][:t])):
                h, w = img.shape[:2]
                factor = r / max(h, w)
                rh, rw = int(round(h * factor)), int(round(w * factor))
                images[i, f, :rh, :rw] = cv2.resize(img, (rw, rh)) / 255.0
                masks[i, f, :rh, :rw] = cv2.resize(
                    m, (rw, rh), interpolation=cv2.INTER_NEAREST)
            k = np.random.randint(1, self.n_points + 1)
            pts = load_points(masks[i, 0], k)
            points[i, :k] = pts[:k]
        return {"image": images, "mask": masks, "prompt_point": points}
