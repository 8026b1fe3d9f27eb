"""SAM interactive segmentation dataset with composite multi-source mixing
and prompt synthesis.

Capability parity with /root/reference/SimpleAICV/interactive_segmentation/
datasets/sam_segmentation_dataset.py:19-1086: multi-source set mixing with
per-source image caps, per-image mask caps (one dataset item per
(image, mask) pair), tiny-mask area filtering, and host-side prompt
synthesis —
- point prompts sampled from the mask foreground (reference
  load_points :367; background points with label 0 when the mask is
  empty),
- box prompt = gt box jittered within the reference noise envelope
  (noise_box :419: noise capped at 10% of box side and 2% of image side,
  clamped to half the box, skipped for near-degenerate boxes),
- mask prompt = gt mask randomly eroded/dilated (noise_mask :464) and
  downsampled to image/4.

Disk layouts:
- png-per-mask: root/<set>/<type>/ with image.jpg + image_mask<k>.png;
- SA-1B-style json: root/<set>/<type>/ with image.jpg + image.json holding
  {"annotations": [{"segmentation": <RLE>}, ...]} (decoded with
  detection.rle).
"""

import json
import math
import os

import numpy as np

__all__ = [
    "SamSegmentationDataset", "SAMCollater", "load_points", "mask_to_box",
    "noise_box", "noise_mask",
]


def load_points(mask, n_points=1, rs=None):
    """Sample prompt points [n, 3] (x, y, label); pads with -1 rows.

    Foreground points get label 1; when the mask has no foreground the
    points are drawn from the background with label 0 (reference
    load_points :367-390)."""
    rs = rs or np.random
    ys, xs = np.nonzero(mask > 0.5)
    label = 1.0
    if len(ys) == 0:
        ys, xs = np.nonzero(mask <= 0.5)
        label = 0.0
    out = np.full((n_points, 3), -1.0, np.float32)
    if len(ys) == 0:
        return out
    take = min(n_points, len(ys))
    sel = rs.choice(len(ys), take, replace=False)
    out[:take, 0] = xs[sel]
    out[:take, 1] = ys[sel]
    out[:take, 2] = label
    return out


def mask_to_box(mask):
    ys, xs = np.nonzero(mask > 0.5)
    if len(ys) == 0:
        return np.zeros(4, np.float32), False
    return np.array([xs.min(), ys.min(), xs.max(), ys.max()],
                    np.float32), True


def noise_box(box, image_hw, noise_ratio=0.1, area_filter_ratio=0.0001,
              rs=None):
    """Jitter box corners (reference noise_box :419): noise amplitude is
    noise_ratio of the side, capped at 2% of the image side, each shift
    clamped to half the box; near-degenerate boxes pass through."""
    rs = rs or np.random
    h, w = image_hw
    bw, bh = float(box[2] - box[0]), float(box[3] - box[1])
    if bh / h <= math.sqrt(area_filter_ratio) or \
            bw / w <= math.sqrt(area_filter_ratio):
        return box.astype(np.float32)
    noise_x = min(int(w * 0.02), bw * noise_ratio)
    noise_y = min(int(h * 0.02), bh * noise_ratio)
    if noise_x <= 1 or noise_y <= 1:
        return box.astype(np.float32)

    def shift(amp, half):
        return max(min(rs.randint(-int(amp), int(amp)), half), -half)

    out = np.array([
        box[0] + shift(noise_x, bw / 2),
        box[1] + shift(noise_y, bh / 2),
        box[2] + shift(noise_x, bw / 2),
        box[3] + shift(noise_y, bh / 2),
    ], np.float32)
    out[0::2] = np.clip(out[0::2], 0, w)
    out[1::2] = np.clip(out[1::2], 0, h)
    if out[0] >= out[2] or out[1] >= out[3]:
        return box.astype(np.float32)
    return out


def noise_mask(mask, mask_noise_area_ratio=0.04, area_filter_ratio=0.0001,
               rs=None):
    """Randomly erode or dilate the mask by a kernel scaled to
    sqrt(noise area)/2 (reference noise_mask :464); tiny masks and noise
    that would wipe the mask pass through unchanged."""
    import cv2
    rs = rs or np.random
    h, w = mask.shape[:2]
    area = float(np.count_nonzero(mask))
    total = float(h * w)
    if area / total < area_filter_ratio:
        return mask.astype(np.float32)
    reduce_area = area * mask_noise_area_ratio
    if reduce_area / total < area_filter_ratio:
        return mask.astype(np.float32)
    max_kernel = math.sqrt(reduce_area) / 2.0
    if int(max_kernel) <= 1:
        return mask.astype(np.float32)
    k = rs.randint(1, int(max_kernel))
    kernel = np.ones((k, k), np.uint8)
    if rs.uniform(0, 1) < 0.5:
        out = cv2.erode(mask.astype(np.float32), kernel, iterations=1)
    else:
        out = cv2.dilate(mask.astype(np.float32), kernel, iterations=1)
    if np.count_nonzero(out) / total > area_filter_ratio:
        return out.astype(np.float32)
    return mask.astype(np.float32)


class SamSegmentationDataset:
    """One item per (image, instance mask) pair across mixed sources.

    Args:
      root_dir: dataset root.
      set_name_list: source set names (subdirs of root_dir).
      set_type: "train" / "val" split subdir.
      per_set_image_choose_max_num: int or {set_name: int} cap on images
        taken from each source (reference per_set_image_choose_max_num).
      per_image_mask_chosse_max_num: cap on masks per image (reference
        default 16; the reference's spelling is kept for config parity).
      area_filter_ratio: drop masks whose area is below this fraction of
        the image.
    """

    def __init__(self, root_dir, set_name_list=(), set_type="train",
                 per_set_image_choose_max_num=None,
                 per_image_mask_chosse_max_num=16,
                 area_filter_ratio=0.0001, transform=None, max_points=9):
        self.transform = transform
        self.max_points = max_points
        self.area_filter_ratio = area_filter_ratio
        entries = []  # (image_path, kind, payload)
        for set_name in set_name_list:
            set_dir = os.path.join(root_dir, set_name, set_type)
            if not os.path.isdir(set_dir):
                continue
            cap = per_set_image_choose_max_num
            if isinstance(cap, dict):
                cap = cap.get(set_name)
            images = sorted(n for n in os.listdir(set_dir)
                            if n.endswith(".jpg"))
            if cap is not None:
                images = images[:cap]
            for name in images:
                stem = name.rsplit(".", 1)[0]
                image_path = os.path.join(set_dir, name)
                json_path = os.path.join(set_dir, stem + ".json")
                if os.path.exists(json_path):
                    with open(json_path) as f:
                        anns = json.load(f).get("annotations", [])
                    kept = 0
                    for k, ann in enumerate(anns):
                        if kept >= per_image_mask_chosse_max_num:
                            break
                        # tiny-mask filter on the SA-1B area field
                        # (reference area_filter_ratio screening)
                        seg = ann.get("segmentation", {})
                        area = ann.get("area")
                        if area is not None and isinstance(seg, dict) \
                                and "size" in seg:
                            h0, w0 = seg["size"]
                            if area / float(h0 * w0) < area_filter_ratio:
                                continue
                        entries.append((image_path, "json",
                                        (json_path, k)))
                        kept += 1
                    continue
                masks = sorted(
                    n for n in os.listdir(set_dir)
                    if n.startswith(stem + "_mask") and n.endswith(".png"))
                for m in masks[:per_image_mask_chosse_max_num]:
                    entries.append((image_path, "png",
                                    os.path.join(set_dir, m)))
        self.entries = entries

    def __len__(self):
        return len(self.entries)

    def _load_mask(self, kind, payload, image_hw):
        import cv2
        if kind == "png":
            return (cv2.imread(payload, cv2.IMREAD_GRAYSCALE) >
                    127).astype(np.float32)
        json_path, k = payload
        with open(json_path) as f:
            ann = json.load(f)["annotations"][k]
        seg = ann["segmentation"]
        from ...detection.rle import coco_rle_to_mask, rle_decode
        # SA-1B ships compressed string counts; list counts also accepted
        if isinstance(seg.get("counts"), str):
            return coco_rle_to_mask(seg).astype(np.float32)
        return rle_decode(seg).astype(np.float32)

    def __getitem__(self, idx):
        import cv2
        image_path, kind, payload = self.entries[idx]
        image = cv2.cvtColor(cv2.imread(image_path),
                             cv2.COLOR_BGR2RGB).astype(np.float32)
        mask = self._load_mask(kind, payload, image.shape[:2])
        sample = {
            "image": image,
            "mask": mask,
            "size": np.array(image.shape[:2], np.float32),
        }
        if self.transform is not None:
            sample = self.transform(sample)
        return sample


class SAMCollater:
    """Fixed-shape SAM batch: 1024-square images, one target mask per image,
    synthesized prompts with per-type validity (prompt type chosen per
    sample by `prompt_probs` = (point, box, mask) probabilities; reference
    samples a single type per iteration, scripts.py:324-362). The mask
    prompt is the gt mask perturbed by noise_mask before downsampling
    (reference noise_mask :464)."""

    def __init__(self, resize=1024, n_points=9, prompt_probs=(0.5, 0.25,
                                                              0.25),
                 box_noise_wh_ratio=0.1, mask_noise_area_ratio=0.04,
                 area_filter_ratio=0.0001):
        self.resize = resize
        self.n_points = n_points
        self.prompt_probs = prompt_probs
        self.box_noise_wh_ratio = box_noise_wh_ratio
        self.mask_noise_area_ratio = mask_noise_area_ratio
        self.area_filter_ratio = area_filter_ratio

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
                    boxes[i] = noise_box(
                        box, (r, r),
                        noise_ratio=self.box_noise_wh_ratio,
                        area_filter_ratio=self.area_filter_ratio)
                    boxes_valid[i] = 1.0
            else:
                noised = noise_mask(
                    full, mask_noise_area_ratio=self.mask_noise_area_ratio,
                    area_filter_ratio=self.area_filter_ratio)
                small = cv2.resize(noised, (rq, rq),
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
