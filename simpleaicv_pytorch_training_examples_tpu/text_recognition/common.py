"""Text recognition label converter, transforms, collater.

Parity with /root/reference/SimpleAICV/text_recognition/common.py:
- CTCTextLabelConverter (:600-660): char table + blank at a fixed index,
  encode to padded int arrays, greedy decode with repeat collapse + blank
  drop; unknown chars map to the garbage char '㍿'.
- KeepRatioResizeTextRecognitionCollater (:543): height -> 32, keep aspect,
  pad width to a fixed max (static shapes).
- Photometric augs (brightness / blur / rotate / scale) plus the full
  WarpMLS geometric family (warp_mls + Distort / Stretch / Perspective —
  a vectorized MLS re-implementation, see warp_mls below).
"""

import numpy as np

from ..classification.common import load_state_dict  # re-export

__all__ = ["CTCTextLabelConverter", "KeepRatioResizeTextRecognitionCollater",
           "Normalize", "RandomBrightness", "RandomBlur", "RandomRotate",
           "load_state_dict"]

GARBAGE_CHAR = "㍿"


class CTCTextLabelConverter:

    def __init__(self, chars=None, chars_file=None, blank_index=0,
                 garbage_char=GARBAGE_CHAR, str_max_length=80):
        if chars is None and chars_file:
            with open(chars_file, encoding="utf-8") as f:
                # one char per line; ' ' (space) is a valid table entry, so
                # only the trailing newline may be stripped
                chars = [line[:-1] if line.endswith("\n") else line
                         for line in f]
                chars = [c for c in chars if c]
        assert chars, "char table required"
        if garbage_char not in chars:
            chars = list(chars) + [garbage_char]
        self.str_max_length = str_max_length
        self.blank_index = blank_index
        self.garbage_char = garbage_char
        # blank occupies blank_index; chars fill the rest in order
        self.chars = list(chars)
        self.char_to_index = {}
        idx = 0
        for c in self.chars:
            if idx == blank_index:
                idx += 1
            self.char_to_index[c] = idx
            idx += 1
        self.index_to_char = {v: k for k, v in self.char_to_index.items()}
        self.num_classes = len(self.chars) + 1  # + blank

    def encode(self, texts):
        """list[str] -> (targets [B, L] int32, lengths [B] int32)."""
        b = len(texts)
        targets = np.zeros((b, self.str_max_length), np.int32)
        lengths = np.zeros((b,), np.int32)
        for i, text in enumerate(texts):
            text = text[:self.str_max_length]
            for j, ch in enumerate(text):
                targets[i, j] = self.char_to_index.get(
                    ch, self.char_to_index[self.garbage_char])
            lengths[i] = len(text)
        return targets, lengths

    def decode(self, indices):
        """[T] int array -> str (collapse repeats, drop blanks)."""
        out = []
        prev = -1
        for idx in np.asarray(indices).tolist():
            if idx != prev and idx != self.blank_index:
                out.append(self.index_to_char.get(idx, self.garbage_char))
            prev = idx
        return "".join(out)

    def decode_batch(self, preds):
        """[B, T, C] logits/probs -> list[str] greedy decodes."""
        ids = np.argmax(np.asarray(preds), axis=-1)
        return [self.decode(row) for row in ids]


class RandomBrightness:

    def __init__(self, prob=0.3, factor_range=(0.5, 1.5)):
        self.prob = prob
        self.factor_range = factor_range

    def __call__(self, sample):
        if np.random.uniform(0, 1) < self.prob:
            f = np.random.uniform(*self.factor_range)
            sample["image"] = np.clip(sample["image"] * f, 0, 255)
        return sample


class RandomBlur:

    def __init__(self, prob=0.2):
        self.prob = prob

    def __call__(self, sample):
        if np.random.uniform(0, 1) < self.prob:
            import cv2
            sample["image"] = cv2.GaussianBlur(sample["image"], (3, 3), 0)
        return sample


class RandomRotate:

    def __init__(self, prob=0.3, angle_range=(-5, 5)):
        self.prob = prob
        self.angle_range = angle_range

    def __call__(self, sample):
        if np.random.uniform(0, 1) < self.prob:
            import cv2
            img = sample["image"]
            h, w = img.shape[:2]
            angle = np.random.uniform(*self.angle_range)
            M = cv2.getRotationMatrix2D((w / 2, h / 2), angle, 1.0)
            sample["image"] = cv2.warpAffine(img, M, (w, h),
                                             borderValue=(128, 128, 128))
        return sample


class Normalize:

    def __call__(self, sample):
        sample["image"] = sample["image"].astype(np.float32) / 255.0
        return sample


class KeepRatioResizeTextRecognitionCollater:
    """height -> resize_h, keep aspect, right-pad width to max_w."""

    def __init__(self, converter, resize_h=32, max_w=512):
        self.converter = converter
        self.resize_h = resize_h
        self.max_w = max_w

    def __call__(self, samples):
        import cv2
        n = len(samples)
        images = np.zeros((n, self.resize_h, self.max_w, 3), np.float32)
        texts = []
        for i, s in enumerate(samples):
            img = s["image"]
            h, w = img.shape[:2]
            rw = min(self.max_w, max(1, int(round(w * self.resize_h / h))))
            img = cv2.resize(img, (rw, self.resize_h))
            images[i, :, :rw] = img
            texts.append(s["label"])
        targets, lengths = self.converter.encode(texts)
        return {"image": images, "target": targets,
                "target_length": lengths}


def warp_mls(image, src_pts, dst_pts, grid_size=100, trans_ratio=1.0):
    """Moving-least-squares similarity deformation (vectorized).

    Capability parity with the reference's WarpMLS
    (/root/reference/SimpleAICV/text_recognition/common.py:171-327, itself
    from the public RubanSeven/Text-Image-Augmentation-python): the MLS
    similarity backward map is evaluated on a coarse node grid, bilinearly
    densified, and the image is resampled. This implementation batches all
    grid nodes through one numpy einsum pass instead of nested per-node
    loops, and resamples with cv2.remap.
    """
    import cv2
    h, w = image.shape[:2]
    p = np.asarray(dst_pts, np.float64)  # control points in the output
    q = np.asarray(src_pts, np.float64)  # where they come from in the src
    if len(p) < 2:
        return image.astype(np.float32)

    gx = np.unique(np.clip(np.arange(0, w + grid_size, grid_size), 0, w - 1))
    gy = np.unique(np.clip(np.arange(0, h + grid_size, grid_size), 0, h - 1))
    nx_, ny_ = np.meshgrid(gx, gy)                      # [Gy, Gx]
    nodes = np.stack([nx_.ravel(), ny_.ravel()], 1)     # [N, 2]

    d2 = ((nodes[:, None, :] - p[None]) ** 2).sum(-1)   # [N, K]
    exact = d2 < 1e-8                                   # node == control pt
    wgt = 1.0 / np.maximum(d2, 1e-8)                    # [N, K]
    sw = wgt.sum(1, keepdims=True)
    pstar = (wgt[..., None] * p[None]).sum(1) / sw      # [N, 2]
    qstar = (wgt[..., None] * q[None]).sum(1) / sw
    phat = p[None] - pstar[:, None]                     # [N, K, 2]
    cur = nodes - pstar                                 # [N, 2]
    mu = (wgt * (phat ** 2).sum(-1)).sum(1)             # [N]
    mu = np.maximum(mu, 1e-8)

    def perp(v):
        return np.stack([-v[..., 1], v[..., 0]], -1)

    phat_j = perp(phat)
    cur_j = perp(cur)
    a = (phat * cur[:, None]).sum(-1)                   # pt_i . cur  [N,K]
    b = (phat_j * cur[:, None]).sum(-1)                 # pt_j . cur
    c = (phat * cur_j[:, None]).sum(-1)                 # pt_i . cur_j
    d = (phat_j * cur_j[:, None]).sum(-1)               # pt_j . cur_j
    new_x = (wgt * (a * q[None, :, 0] - b * q[None, :, 1])).sum(1) / mu
    new_y = (wgt * (-c * q[None, :, 0] + d * q[None, :, 1])).sum(1) / mu
    new = np.stack([new_x, new_y], 1) + qstar           # [N, 2]

    # nodes that coincide with a control point map straight to its source
    hit = exact.any(1)
    if hit.any():
        new[hit] = q[exact.argmax(1)[hit]]

    delta = (new - nodes).reshape(len(gy), len(gx), 2)

    # densify the sparse node grid (cells may be ragged at the borders)
    xs = np.arange(w, dtype=np.float64)
    ys = np.arange(h, dtype=np.float64)
    ix = np.clip(np.searchsorted(gx, xs, "right") - 1, 0, len(gx) - 2)
    iy = np.clip(np.searchsorted(gy, ys, "right") - 1, 0, len(gy) - 2)
    fx = (xs - gx[ix]) / np.maximum(gx[ix + 1] - gx[ix], 1e-8)
    fy = (ys - gy[iy]) / np.maximum(gy[iy + 1] - gy[iy], 1e-8)
    d00 = delta[iy][:, ix]
    d01 = delta[iy][:, ix + 1]
    d10 = delta[iy + 1][:, ix]
    d11 = delta[iy + 1][:, ix + 1]
    fyg = fy[:, None, None]
    fxg = fx[None, :, None]
    dense = (d00 * (1 - fyg) * (1 - fxg) + d01 * (1 - fyg) * fxg +
             d10 * fyg * (1 - fxg) + d11 * fyg * fxg)  # [h, w, 2]

    map_x = (xs[None, :] + dense[..., 0] * trans_ratio).astype(np.float32)
    map_y = (ys[:, None] + dense[..., 1] * trans_ratio).astype(np.float32)
    out = cv2.remap(image.astype(np.float32), map_x, map_y,
                    cv2.INTER_LINEAR, borderMode=cv2.BORDER_REPLICATE)
    return np.clip(out, 0, 255).astype(np.float32)


def _text_segments(label_len, img_w):
    """Segment count heuristic shared by Distort/Stretch (reference
    common.py:349-356)."""
    if label_len < 20:
        seg = label_len
    elif label_len < 40:
        seg = label_len // 2
    else:
        seg = label_len // 4
    return max(int(seg), 1)


class Distort:
    """MLS jitter of the 4 corners + per-segment edge points (reference
    common.py:327-405)."""

    def __init__(self, prob=0.2):
        self.prob = prob

    def __call__(self, sample):
        if np.random.uniform() > self.prob:
            return sample
        img = sample["image"]
        h, w = img.shape[:2]
        if w < 3 * h or len(sample["label"]) < 3:
            return sample
        seg = _text_segments(len(sample["label"]), w)
        cut = w // seg
        thresh = cut // 3
        if thresh <= 0:
            return sample
        r = lambda: np.random.randint(thresh)
        src = [[0, 0], [w, 0], [w, h], [0, h]]
        dst = [[r(), r()], [w - r(), r()], [w - r(), h - r()],
               [r(), h - r()]]
        half = thresh * 0.5
        for k in range(1, seg):
            src += [[cut * k, 0], [cut * k, h]]
            dst += [[cut * k + r() - half, r() - half],
                    [cut * k + r() - half, h + r() - half]]
        sample["image"] = warp_mls(img, src, dst)
        sample["size"] = np.array(sample["image"].shape[:2], np.float32)
        return sample


class Stretch:
    """MLS horizontal jitter of per-segment edge points (reference
    common.py:408-473)."""

    def __init__(self, prob=0.2):
        self.prob = prob

    def __call__(self, sample):
        if np.random.uniform() > self.prob:
            return sample
        img = sample["image"]
        h, w = img.shape[:2]
        if w < 3 * h or len(sample["label"]) < 3:
            return sample
        seg = _text_segments(len(sample["label"]), w)
        cut = w // seg
        thresh = cut * 4 // 5
        half = thresh * 0.5
        src = [[0, 0], [w, 0], [w, h], [0, h]]
        dst = [[0, 0], [w, 0], [w, h], [0, h]]
        for k in range(1, seg):
            move = np.random.randint(thresh) - half if thresh else 0
            src += [[cut * k, 0], [cut * k, h]]
            dst += [[cut * k + move, 0], [cut * k + move, h]]
        sample["image"] = warp_mls(img, src, dst)
        sample["size"] = np.array(sample["image"].shape[:2], np.float32)
        return sample


class Perspective:
    """MLS vertical corner jitter (reference common.py:476-522)."""

    def __init__(self, prob=0.2):
        self.prob = prob

    def __call__(self, sample):
        if np.random.uniform() > self.prob:
            return sample
        img = sample["image"]
        h, w = img.shape[:2]
        if w < 3 * h or len(sample["label"]) < 3:
            return sample
        thresh = h // 2
        r = lambda: np.random.randint(thresh)
        src = [[0, 0], [w, 0], [w, h], [0, h]]
        dst = [[0, r()], [w, r()], [w, h - r()], [0, h - r()]]
        sample["image"] = warp_mls(img, src, dst)
        sample["size"] = np.array(sample["image"].shape[:2], np.float32)
        return sample


class RandomScale:
    """Random isotropic rescale (reference common.py:17-54)."""

    def __init__(self, prob=0.5, scale_range=(0.8, 1.2)):
        self.prob = prob
        self.scale_range = scale_range

    def __call__(self, sample):
        if np.random.uniform() > self.prob:
            return sample
        import cv2
        img = sample["image"]
        s = np.random.uniform(*self.scale_range)
        h, w = img.shape[:2]
        nh, nw = max(int(h * s), 1), max(int(w * s), 1)
        sample["image"] = cv2.resize(img, (nw, nh)).astype(np.float32)
        sample["size"] = np.array([nh, nw], np.float32)
        return sample
