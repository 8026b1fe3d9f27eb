"""SAM2 video segmentation dataset + collaters.

Capability parity with /root/reference/SimpleAICV/
video_interactive_segmentation/datasets/
sam2_video_segmentation_dataset.py:28-2069:
- composite multi-source mixing: video sets AND image sets (an image
  becomes a static 1-frame-repeated clip) with per-source caps;
- one dataset item per (video, object) pair (the reference's
  per_video_choose_object_nums objects fold into the batch axis — the
  TPU-native equivalent of its per-object memory banks);
- per-frame prompt synthesis with noise (load_frame_points :1310,
  noise_frame_box :1393, noise_frame_mask :1453) emitted as fixed-shape
  [B,T,...] arrays with validity flags;
- condition-frame sampling (always frame 0 + random extras) and
  point-iteration frame selection (sam2video_train.py:208-357) as [T]
  flag vectors consumed by SAM2Video.__call__.

Disk layouts under root/<set>/<type>/:
- video sets: <video_id>/00000.jpg + 00000_mask.png (object 0) or
  00000_mask<k>.png per object k;
- image sets (mixed as 1-frame clips): image.jpg + image_mask<k>.png.
"""

import os

import numpy as np

from ...interactive_segmentation.datasets.sam_segmentation_dataset import (
    load_points, mask_to_box, noise_box, noise_mask)

__all__ = ["SAM2VideoSegmentationDataset", "SAM2VideoCollater",
           "SAM2VideoBatchCollater"]


def _list_object_ids(vdir, frames):
    """Object ids present in a video dir: _mask<k>.png suffixes (plus the
    bare _mask.png as object 0)."""
    stem0 = frames[0].rsplit(".", 1)[0]
    ids = set()
    for n in os.listdir(vdir):
        if not (n.startswith(stem0 + "_mask") and n.endswith(".png")):
            continue
        suffix = n[len(stem0 + "_mask"):-len(".png")]
        ids.add(int(suffix) if suffix.isdigit() else 0)
    return sorted(ids)


class SAM2VideoSegmentationDataset:

    def __init__(self, video_root_dir=None, video_set_name=(),
                 video_set_type="train",
                 image_root_dir=None, image_set_name=(),
                 image_set_type="train",
                 image_per_set_image_choose_max_num=None,
                 per_set_video_choose_max_num=None,
                 per_image_mask_chosse_max_num=16,
                 per_video_choose_object_nums=2,
                 frame_nums=8, transform=None,
                 # legacy single-root signature
                 root_dir=None, set_name_list=(), set_type="train"):
        if root_dir is not None:  # legacy: video sets under one root
            video_root_dir = root_dir
            video_set_name = set_name_list
            video_set_type = set_type
        self.transform = transform
        self.frame_nums = frame_nums
        self.entries = []  # ("video", vdir, frames, obj) |
        #                    ("image", image_path, mask_path)
        if video_root_dir:
            for set_name in video_set_name:
                set_dir = os.path.join(video_root_dir, set_name,
                                       video_set_type)
                if not os.path.isdir(set_dir):
                    continue
                cap = per_set_video_choose_max_num
                if isinstance(cap, dict):
                    cap = cap.get(set_name)
                vids = sorted(v for v in os.listdir(set_dir)
                              if os.path.isdir(os.path.join(set_dir, v)))
                if cap is not None:
                    vids = vids[:cap]
                for vid in vids:
                    vdir = os.path.join(set_dir, vid)
                    frames = sorted(n for n in os.listdir(vdir)
                                    if n.endswith(".jpg"))
                    if not frames:
                        continue
                    obj_ids = _list_object_ids(vdir, frames) or [0]
                    for obj in obj_ids[:per_video_choose_object_nums]:
                        self.entries.append(("video", vdir, frames, obj))
        if image_root_dir:
            for set_name in image_set_name:
                set_dir = os.path.join(image_root_dir, set_name,
                                       image_set_type)
                if not os.path.isdir(set_dir):
                    continue
                cap = image_per_set_image_choose_max_num
                if isinstance(cap, dict):
                    cap = cap.get(set_name)
                images = sorted(n for n in os.listdir(set_dir)
                                if n.endswith(".jpg"))
                if cap is not None:
                    images = images[:cap]
                for name in images:
                    stem = name.rsplit(".", 1)[0]
                    masks = sorted(
                        n for n in os.listdir(set_dir)
                        if n.startswith(stem + "_mask") and
                        n.endswith(".png"))
                    for m in masks[:per_image_mask_chosse_max_num]:
                        self.entries.append(
                            ("image", os.path.join(set_dir, name),
                             os.path.join(set_dir, m)))

    def __len__(self):
        return len(self.entries)

    @staticmethod
    def _read_mask(path, obj):
        import cv2
        raw = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if raw is None:
            return None
        values = np.unique(raw)
        if len(values) > 2 and obj is not None:
            # indexed multi-object mask: object ids are pixel values 1..K
            return (raw == obj + 1).astype(np.float32)
        return (raw > 127).astype(np.float32)

    def __getitem__(self, idx):
        import cv2
        entry = self.entries[idx]
        t = self.frame_nums
        images, masks = [], []
        if entry[0] == "image":
            # image as a static clip: repeated frames, same mask
            _, image_path, mask_path = entry
            img = cv2.cvtColor(cv2.imread(image_path),
                               cv2.COLOR_BGR2RGB).astype(np.float32)
            m = self._read_mask(mask_path, None)
            images = [img] * t
            masks = [m] * t
        else:
            _, vdir, frames, obj = entry
            if len(frames) >= t:
                start = np.random.randint(0, len(frames) - t + 1)
                chosen = frames[start:start + t]
            else:
                chosen = list(frames) + [frames[-1]] * (t - len(frames))
            for name in chosen:
                img = cv2.cvtColor(cv2.imread(os.path.join(vdir, name)),
                                   cv2.COLOR_BGR2RGB).astype(np.float32)
                stem = name.rsplit(".", 1)[0]
                m = None
                for cand in (f"{stem}_mask{obj}.png", f"{stem}_mask.png"):
                    p = os.path.join(vdir, cand)
                    if os.path.exists(p):
                        m = self._read_mask(p, obj)
                        break
                if m is None:
                    m = np.zeros(img.shape[:2], np.float32)
                images.append(img)
                masks.append(m)
        sample = {"images": images, "masks": masks}
        if self.transform is not None:
            sample = self.transform(sample)
        return sample


class SAM2VideoCollater:
    """Fixed-shape video batch + frame-0 point prompt synthesis (the
    original frame-0-only recipe; kept for eval and the stage-1 image
    recipe)."""

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


class SAM2VideoBatchCollater:
    """The reference condition-frame training recipe as fixed-shape arrays
    (sam2video_train.py:208-357 prepare_batch_prompt_inputs):

    - one prompt TYPE per batch, drawn from prompt_probs (point/box/mask);
    - condition frames: frame 0 always + up to extra_cond_frames random
      frames (shared across the batch so the jitted tracking step sees one
      [T] flag vector); each condition frame carries synthesized prompts
      from ITS OWN gt mask, with the reference noise (noise_frame_box /
      noise_frame_mask);
    - point-iteration frames: point_iter_frame_num random non-condition
      frames flagged for in-graph error-click refinement;
    - non-condition frames carry all-invalid prompts (-1 points, valid=0),
      which the prompt encoder maps to the no-prompt embeddings.

    Output: image [B,T,r,r,3], mask [B,T,r,r],
    prompt_point [B,T,P,3], prompt_box [B,T,4] (+_valid [B,T]),
    prompt_mask [B,T,r/4,r/4,1] (+_valid [B,T]),
    is_cond_frame [B,T], is_iter_frame [B,T] (tiled per sample so the
    batch shards evenly over the data mesh axis; reduce with .max(axis=0)
    inside the step).
    """

    def __init__(self, resize=1024, frame_nums=8, n_points=2,
                 prompt_probs=(0.5, 0.25, 0.25), extra_cond_frames=1,
                 point_iter_frame_num=2, box_noise_wh_ratio=0.1,
                 mask_noise_area_ratio=0.04, area_filter_ratio=0.0001):
        self.resize = resize
        self.frame_nums = frame_nums
        self.n_points = n_points
        self.prompt_probs = prompt_probs
        self.extra_cond_frames = extra_cond_frames
        self.point_iter_frame_num = point_iter_frame_num
        self.box_noise_wh_ratio = box_noise_wh_ratio
        self.mask_noise_area_ratio = mask_noise_area_ratio
        self.area_filter_ratio = area_filter_ratio

    def __call__(self, samples):
        import cv2
        n = len(samples)
        r = self.resize
        rq = r // 4
        t = self.frame_nums
        p = self.n_points
        images = np.zeros((n, t, r, r, 3), np.float32)
        masks = np.zeros((n, t, r, r), np.float32)
        points = np.full((n, t, p, 3), -1.0, np.float32)
        boxes = np.zeros((n, t, 4), np.float32)
        boxes_valid = np.zeros((n, t), np.float32)
        prompt_masks = np.zeros((n, t, rq, rq, 1), np.float32)
        masks_valid = np.zeros((n, t), np.float32)

        # frame roles, shared across the batch
        is_cond = np.zeros((t,), np.float32)
        is_cond[0] = 1.0
        if t > 1 and self.extra_cond_frames > 0:
            extra = np.random.randint(0, self.extra_cond_frames + 1)
            if extra:
                choices = np.random.choice(
                    np.arange(1, t), min(extra, t - 1), replace=False)
                is_cond[choices] = 1.0
        is_iter = np.zeros((t,), np.float32)
        non_cond = np.where(is_cond == 0)[0]
        if len(non_cond) and self.point_iter_frame_num > 0:
            k = min(self.point_iter_frame_num, len(non_cond))
            is_iter[np.random.choice(non_cond, k, replace=False)] = 1.0

        ptype = np.random.choice(3, p=self.prompt_probs)
        for i, s in enumerate(samples):
            for f, (img, m) in enumerate(zip(s["images"][:t],
                                             s["masks"][:t])):
                h, w = img.shape[:2]
                factor = r / max(h, w)
                rh, rw = int(round(h * factor)), int(round(w * factor))
                images[i, f, :rh, :rw] = cv2.resize(img, (rw, rh)) / 255.0
                masks[i, f, :rh, :rw] = cv2.resize(
                    m, (rw, rh), interpolation=cv2.INTER_NEAREST)
            for f in np.where(is_cond > 0)[0]:
                gt = masks[i, f]
                if ptype == 0:
                    k = np.random.randint(1, p + 1)
                    pts = load_points(gt, k)
                    points[i, f, :k] = pts[:k]
                elif ptype == 1:
                    box, ok = mask_to_box(gt)
                    if ok:
                        boxes[i, f] = noise_box(
                            box, (r, r),
                            noise_ratio=self.box_noise_wh_ratio,
                            area_filter_ratio=self.area_filter_ratio)
                        boxes_valid[i, f] = 1.0
                else:
                    noised = noise_mask(
                        gt,
                        mask_noise_area_ratio=self.mask_noise_area_ratio,
                        area_filter_ratio=self.area_filter_ratio)
                    small = cv2.resize(noised, (rq, rq),
                                       interpolation=cv2.INTER_LINEAR)
                    prompt_masks[i, f, :, :, 0] = (small > 0.5).astype(
                        np.float32)
                    masks_valid[i, f] = 1.0
        return {
            "image": images,
            "mask": masks,
            "prompt_point": points,
            "prompt_box": boxes,
            "prompt_box_valid": boxes_valid,
            "prompt_mask": prompt_masks,
            "prompt_mask_valid": masks_valid,
            "is_cond_frame": np.tile(is_cond, (n, 1)),
            "is_iter_frame": np.tile(is_iter, (n, 1)),
        }
