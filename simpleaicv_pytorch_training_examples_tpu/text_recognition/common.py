"""Text recognition label converter, transforms, collater.

Parity with /root/reference/SimpleAICV/text_recognition/common.py:
- CTCTextLabelConverter (:600-660): char table + blank at a fixed index,
  encode to padded int arrays, greedy decode with repeat collapse + blank
  drop; unknown chars map to the garbage char '㍿'.
- KeepRatioResizeTextRecognitionCollater (:543): height -> 32, keep aspect,
  pad width to a fixed max (static shapes).
- Basic photometric augs (brightness / blur / rotate) standing in for the
  WarpMLS distort/stretch/perspective family (offline-preprocessing augs in
  the reference; full WarpMLS is future work).
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
                chars = [line.rstrip("\n") for line in f if line.rstrip()]
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
