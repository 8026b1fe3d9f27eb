"""SAM2 video matting dataset + collaters.

Capability parity with /root/reference/SimpleAICV/
video_interactive_segmentation/datasets/sam2_video_matting_dataset.py and
sam2_image_matting_dataset.py (core mechanics): clips of T frames with
per-frame alpha mattes for one tracked object, per-frame trimaps derived
by erosion/dilation, frame-0 point-prompt synthesis from the binarized
alpha. Image matting datasets mix in as 1-frame clips.

Disk layout: root/<set_name>/<set_type>/<video_id>/ with 00000.jpg ... and
00000_alpha.png ... per frame.
"""

import os

import numpy as np

from ...interactive_segmentation.datasets.sam_segmentation_dataset import (
    load_points)

__all__ = ["SAM2VideoMattingDataset", "SAM2VideoMattingCollater",
           "SAM2VideoMattingBatchCollater", "SAM2ImageMattingCollater"]


def _make_trimap(alpha, kernel_size=15):
    """alpha [H,W] in [0,1] -> trimap in {0, 128, 255} (same recipe as
    human_matting_dataset._make_trimap)."""
    import cv2
    kernel = np.ones((kernel_size, kernel_size), np.uint8)
    fg = (alpha > 0.95).astype(np.uint8)
    unknown = ((alpha > 0.05) & (alpha <= 0.95)).astype(np.uint8)
    fg_eroded = cv2.erode(fg, kernel)
    unknown_dilated = cv2.dilate(unknown | (fg - fg_eroded), kernel)
    trimap = np.zeros_like(alpha, np.float32)
    trimap[unknown_dilated > 0] = 128.0
    trimap[fg_eroded > 0] = 255.0
    return trimap


class SAM2VideoMattingDataset:
    """Composite video matting mixing (reference
    sam2_video_matting_dataset.py:1310-1451 video-matting composites):

    - foreground-matte video sets (frames are the foreground plates,
      per-frame `_alpha.png` mattes) composited over random background
      video clips with a per-set probability
      (`use_background_video_prob`, reference
      video_matting_use_background_video_prob);
    - image matting sets mixed in as static 1-frame-repeated clips;
    - per-source video caps.

    Disk layouts under the respective roots:
    - video sets: <set>/<type>/<video_id>/00000.jpg + 00000_alpha.png;
    - background videos: <type>/<video_id>/00000.jpg (no mattes);
    - image sets: <set>/<type>/image.jpg + image_alpha.png.
    """

    def __init__(self, root_dir, set_name_list=(), set_type="train",
                 frame_nums=8, transform=None,
                 per_set_video_choose_max_num=None,
                 background_root_dir=None, background_set_type="train",
                 use_background_video_prob=None,
                 image_root_dir=None, image_set_name=(),
                 image_set_type="train"):
        self.transform = transform
        self.frame_nums = frame_nums
        self.use_background_video_prob = use_background_video_prob
        self.entries = []  # ("video", set, vdir, frames) | ("image", ...)
        for set_name in set_name_list:
            set_dir = os.path.join(root_dir, set_name, set_type)
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
                if frames:
                    self.entries.append(("video", set_name, vdir, frames))
        if image_root_dir:
            for set_name in image_set_name:
                set_dir = os.path.join(image_root_dir, set_name,
                                       image_set_type)
                if not os.path.isdir(set_dir):
                    continue
                for name in sorted(n for n in os.listdir(set_dir)
                                   if n.endswith(".jpg")):
                    stem = name.rsplit(".", 1)[0]
                    ap = os.path.join(set_dir, stem + "_alpha.png")
                    if os.path.exists(ap):
                        self.entries.append(
                            ("image", set_name,
                             os.path.join(set_dir, name), ap))
        # background video clips for compositing
        self.background_videos = []
        if background_root_dir:
            bdir = os.path.join(background_root_dir, background_set_type)
            if not os.path.isdir(bdir):
                bdir = background_root_dir
            if os.path.isdir(bdir):
                for vid in sorted(os.listdir(bdir)):
                    vdir = os.path.join(bdir, vid)
                    if not os.path.isdir(vdir):
                        continue
                    frames = sorted(n for n in os.listdir(vdir)
                                    if n.endswith(".jpg"))
                    if frames:
                        self.background_videos.append((vdir, frames))

    def __len__(self):
        return len(self.entries)

    def _bg_prob(self, set_name):
        p = self.use_background_video_prob
        if p is None:
            return 0.0
        if isinstance(p, dict):
            return p.get(set_name, 0.0)
        return float(p)

    def _sample_background_clip(self, t, hw):
        """Random background video clip resized to (h, w), t frames."""
        import cv2
        vdir, frames = self.background_videos[
            np.random.randint(len(self.background_videos))]
        if len(frames) >= t:
            start = np.random.randint(0, len(frames) - t + 1)
            chosen = frames[start:start + t]
        else:
            chosen = list(frames) + [frames[-1]] * (t - len(frames))
        h, w = hw
        out = []
        for name in chosen:
            bg = cv2.cvtColor(cv2.imread(os.path.join(vdir, name)),
                              cv2.COLOR_BGR2RGB).astype(np.float32)
            out.append(cv2.resize(bg, (w, h)))
        return out

    def __getitem__(self, idx):
        import cv2
        entry = self.entries[idx]
        t = self.frame_nums
        if entry[0] == "image":
            _, set_name, image_path, alpha_path = entry
            img = cv2.cvtColor(cv2.imread(image_path),
                               cv2.COLOR_BGR2RGB).astype(np.float32)
            a = cv2.imread(alpha_path,
                           cv2.IMREAD_GRAYSCALE).astype(np.float32) / 255.0
            images, alphas = [img] * t, [a] * t
        else:
            _, set_name, vdir, frames = entry
            if len(frames) >= t:
                start = np.random.randint(0, len(frames) - t + 1)
                chosen = frames[start:start + t]
            else:
                chosen = list(frames) + [frames[-1]] * (t - len(frames))
            images, alphas = [], []
            for name in chosen:
                img = cv2.cvtColor(cv2.imread(os.path.join(vdir, name)),
                                   cv2.COLOR_BGR2RGB).astype(np.float32)
                alpha_path = os.path.join(
                    vdir, name.rsplit(".", 1)[0] + "_alpha.png")
                if os.path.exists(alpha_path):
                    a = cv2.imread(alpha_path,
                                   cv2.IMREAD_GRAYSCALE).astype(np.float32)
                    a = a / 255.0
                else:
                    a = np.zeros(img.shape[:2], np.float32)
                images.append(img)
                alphas.append(a)
            # composite the foreground plates over a random background
            # video clip (reference video-matting composites)
            if self.background_videos and \
                    np.random.uniform() < self._bg_prob(set_name):
                bgs = self._sample_background_clip(
                    t, images[0].shape[:2])
                images = [fg * a[..., None] + bg * (1.0 - a[..., None])
                          for fg, a, bg in zip(images, alphas, bgs)]
        sample = {"images": images, "alphas": alphas}
        if self.transform is not None:
            sample = self.transform(sample)
        return sample


class SAM2VideoMattingCollater:
    """Fixed-shape video batch: per-frame alpha + trimap, frame-0 point
    prompt from the binarized alpha."""

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
        alphas = np.zeros((n, t, r, r), np.float32)
        trimaps = np.zeros((n, t, r, r), np.float32)
        points = np.full((n, self.n_points, 3), -1.0, np.float32)
        for i, s in enumerate(samples):
            for f, (img, a) in enumerate(zip(s["images"][:t],
                                             s["alphas"][:t])):
                h, w = img.shape[:2]
                factor = r / max(h, w)
                rh, rw = int(round(h * factor)), int(round(w * factor))
                images[i, f, :rh, :rw] = cv2.resize(img, (rw, rh)) / 255.0
                alphas[i, f, :rh, :rw] = cv2.resize(a, (rw, rh))
                trimaps[i, f] = _make_trimap(alphas[i, f])
            k = np.random.randint(1, self.n_points + 1)
            pts = load_points((alphas[i, 0] > 0.5).astype(np.float32), k)
            points[i, :k] = pts[:k]
        return {"image": images, "alpha": alphas, "trimap": trimaps,
                "prompt_point": points}


class SAM2ImageMattingCollater(SAM2VideoMattingCollater):
    """1-frame clips for image matting datasets (reference
    sam2_image_matting_dataset.py): squeezes the time axis."""

    def __init__(self, resize=1024, n_points=9):
        super().__init__(resize=resize, frame_nums=1, n_points=n_points)

    def __call__(self, samples):
        for s in samples:
            if "image" in s and "images" not in s:  # image-dataset sample
                s["images"] = [s["image"]]
                s["alphas"] = [s["mask"]]
        out = super().__call__(samples)
        return {"image": out["image"][:, 0], "alpha": out["alpha"][:, 0],
                "trimap": out["trimap"][:, 0],
                "prompt_point": out["prompt_point"]}


class SAM2VideoMattingBatchCollater(SAM2VideoMattingCollater):
    """Condition-frame matting recipe: per-frame prompts synthesized from
    each condition frame's binarized alpha (point / noisy box / noisy
    mask), emitted as fixed-shape [B,T,...] arrays + [B,T] cond flags —
    the matting twin of SAM2VideoBatchCollater."""

    def __init__(self, resize=1024, frame_nums=8, n_points=2,
                 prompt_probs=(0.5, 0.25, 0.25), extra_cond_frames=1):
        super().__init__(resize=resize, frame_nums=frame_nums,
                         n_points=n_points)
        self.prompt_probs = prompt_probs
        self.extra_cond_frames = extra_cond_frames

    def __call__(self, samples):
        import cv2
        from ...interactive_segmentation.datasets.sam_segmentation_dataset import (
            mask_to_box, noise_box, noise_mask)
        base = super().__call__(samples)
        n, t = base["alpha"].shape[:2]
        r = self.resize
        rq = r // 4
        p = self.n_points

        is_cond = np.zeros((t,), np.float32)
        is_cond[0] = 1.0
        if t > 1 and self.extra_cond_frames > 0:
            extra = np.random.randint(0, self.extra_cond_frames + 1)
            if extra:
                sel = np.random.choice(np.arange(1, t),
                                       min(extra, t - 1), replace=False)
                is_cond[sel] = 1.0

        points = np.full((n, t, p, 3), -1.0, np.float32)
        boxes = np.zeros((n, t, 4), np.float32)
        boxes_valid = np.zeros((n, t), np.float32)
        prompt_masks = np.zeros((n, t, rq, rq, 1), np.float32)
        masks_valid = np.zeros((n, t), np.float32)
        ptype = np.random.choice(3, p=self.prompt_probs)
        for i in range(n):
            for f in np.where(is_cond > 0)[0]:
                binary = (base["alpha"][i, f] > 0.5).astype(np.float32)
                if ptype == 0:
                    k = np.random.randint(1, p + 1)
                    pts = load_points(binary, k)
                    points[i, f, :k] = pts[:k]
                elif ptype == 1:
                    box, ok = mask_to_box(binary)
                    if ok:
                        boxes[i, f] = noise_box(box, (r, r))
                        boxes_valid[i, f] = 1.0
                else:
                    small = cv2.resize(noise_mask(binary), (rq, rq))
                    prompt_masks[i, f, :, :, 0] = (small > 0.5).astype(
                        np.float32)
                    masks_valid[i, f] = 1.0
        base.pop("prompt_point", None)
        base.update({
            "prompt_point": points,
            "prompt_box": boxes,
            "prompt_box_valid": boxes_valid,
            "prompt_mask": prompt_masks,
            "prompt_mask_valid": masks_valid,
            "is_cond_frame": np.tile(is_cond, (n, 1)),
        })
        return base
