"""SAM interactive segmentation dataset with prompt synthesis.

Capability parity with /root/reference/SimpleAICV/interactive_segmentation/
datasets/sam_segmentation_dataset.py:19-1086 (core mechanics): multi-source
sets of images with per-instance binary masks, one random target mask per
sample, and host-side prompt synthesis —
- point prompts sampled from the mask foreground (load_points :367),
- box prompt = gt box jittered by up to 10% of side length (noise_box :419),
- mask prompt = gt mask perturbed and downsampled to image/4
  (noise_mask :464).

Disk layout here: root/<set_name>/<set_type>/ with image.jpg + one or more
image_mask<k>.png instance masks (the reference's resaved-SA-1B layout is an
offline preprocessing concern; adapters can map onto this).
"""

import os

import numpy as np


class SamSegmentationDataset:

    def __init__(self, root_dir, set_name_list=(), set_type="train",
                 transform=None, max_points=9, per_image_mask_chosse_max_num=16):
        self.transform = transform
        self.max_points = max_points
        entries = []
        for set_name in set_name_list:
            set_dir = os.path.join(root_dir, set_name, set_type)
            if not os.path.isdir(set_dir):
                continue
            images = sorted(n for n in os.listdir(set_dir)
                            if n.endswith(".jpg"))
            for name in images:
                stem = name.rsplit(".", 1)[0]
                masks = sorted(
                    n for n in os.listdir(set_dir)
                    if n.startswith(stem + "_mask") and n.endswith(".png"))
                if masks:
                    entries.append((os.path.join(set_dir, name), [
                        os.path.join(set_dir, m)
                        for m in masks[:per_image_mask_chosse_max_num]
                    ]))
        self.entries = entries

    def __len__(self):
        return len(self.entries)

    def __getitem__(self, idx):
        import cv2
        image_path, mask_paths = self.entries[idx]
        image = cv2.cvtColor(cv2.imread(image_path),
                             cv2.COLOR_BGR2RGB).astype(np.float32)
        mask_path = mask_paths[np.random.randint(len(mask_paths))]
        mask = (cv2.imread(mask_path, cv2.IMREAD_GRAYSCALE) > 127).astype(
            np.float32)
        sample = {
            "image": image,
            "mask": mask,
            "size": np.array(image.shape[:2], np.float32),
        }
        if self.transform is not None:
            sample = self.transform(sample)
        return sample


def load_points(mask, n_points=1, rs=None):
    """Sample foreground points [n, 3] (x, y, 1); pads with -1 rows."""
    rs = rs or np.random
    ys, xs = np.nonzero(mask > 0.5)
    out = np.full((n_points, 3), -1.0, np.float32)
    if len(ys) == 0:
        return out
    take = min(n_points, len(ys))
    sel = rs.choice(len(ys), take, replace=False)
    out[:take, 0] = xs[sel]
    out[:take, 1] = ys[sel]
    out[:take, 2] = 1.0
    return out


def mask_to_box(mask):
    ys, xs = np.nonzero(mask > 0.5)
    if len(ys) == 0:
        return np.zeros(4, np.float32), False
    return np.array([xs.min(), ys.min(), xs.max(), ys.max()],
                    np.float32), True


def noise_box(box, image_hw, noise_ratio=0.1, rs=None):
    """Jitter box corners by up to noise_ratio of the side length, capped at
    20px (reference noise_box :419)."""
    rs = rs or np.random
    h, w = image_hw
    bw, bh = box[2] - box[0], box[3] - box[1]
    noise = np.array([
        rs.uniform(-1, 1) * min(bw * noise_ratio, 20),
        rs.uniform(-1, 1) * min(bh * noise_ratio, 20),
        rs.uniform(-1, 1) * min(bw * noise_ratio, 20),
        rs.uniform(-1, 1) * min(bh * noise_ratio, 20),
    ], np.float32)
    out = box + noise
    out[0::2] = np.clip(out[0::2], 0, w - 1)
    out[1::2] = np.clip(out[1::2], 0, h - 1)
    return out


class SAMCollater:
    """Fixed-shape SAM batch: 1024-square images, one target mask per image,
    synthesized prompts with per-type validity (prompt type chosen per
    sample by `prompt_probs` = (point, box, mask) probabilities; reference
    samples a single type per iteration, scripts.py:324-362)."""

    def __init__(self, resize=1024, n_points=9, prompt_probs=(0.5, 0.25,
                                                              0.25)):
        self.resize = resize
        self.n_points = n_points
        self.prompt_probs = prompt_probs

    def __call__(self, samples):
        import cv2
        n = len(samples)
        r = self.resize
        rq = r // 4
        images = np.zeros((n, r, r, 3), np.float32)
        masks = np.zeros((n, 1, r, r), np.float32)
        points = np.full((n, self.n_points, 3), -1.0, np.float32)
        boxes = np.zeros((n, 4), np.float32)
        boxes_valid = np.zeros((n,), np.float32)
        prompt_masks = np.zeros((n, rq, rq, 1), np.float32)
        masks_valid = np.zeros((n,), np.float32)
        for i, s in enumerate(samples):
            img, m = s["image"], s["mask"]
            h, w = img.shape[:2]
            factor = r / max(h, w)
            rh, rw = int(round(h * factor)), int(round(w * factor))
            images[i, :rh, :rw] = cv2.resize(img, (rw, rh))
            mask = cv2.resize(m, (rw, rh),
                              interpolation=cv2.INTER_NEAREST)
            masks[i, 0, :rh, :rw] = mask

            ptype = np.random.choice(3, p=self.prompt_probs)
            full = masks[i, 0]
            if ptype == 0:
                k = np.random.randint(1, self.n_points + 1)
                points[i] = np.concatenate([
                    load_points(full, k),
                    np.full((self.n_points - k, 3), -1.0, np.float32)
                ])[:self.n_points]
            elif ptype == 1:
                box, ok = mask_to_box(full)
                if ok:
                    boxes[i] = noise_box(box, (r, r))
                    boxes_valid[i] = 1.0
            else:
                small = cv2.resize(full, (rq, rq),
                                   interpolation=cv2.INTER_LINEAR)
                prompt_masks[i, :, :, 0] = (small > 0.5).astype(np.float32)
                masks_valid[i] = 1.0
        return {
            "image": images,
            "mask": masks,
            "prompt_point": points,
            "prompt_box": boxes,
            "prompt_box_valid": boxes_valid,
            "prompt_mask": prompt_masks,
            "prompt_mask_valid": masks_valid,
        }
