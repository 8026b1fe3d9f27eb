"""DBNet decode (host-side, eval-only).

Parity with /root/reference/SimpleAICV/text_detection/decode.py:19-120
(DBNetDecoder): binarize the probability map, find contours, score each
region by mean probability, unclip (expand) by area*ratio/perimeter, emit
min-area rectangles or polygons. pyclipper is unavailable: unclip uses
rasterize + cv2.dilate with an elliptical kernel of the offset radius —
the same expansion up to pixel quantization. This path is inherently
irregular (variable contour counts) and eval-only, so it stays on host
(SURVEY.md §7).
"""

import numpy as np

__all__ = ["DBNetDecoder"]


class DBNetDecoder:

    def __init__(self, use_morphology=False, min_area_size=9,
                 min_score_threshold=0.3, binary_region_threshold=0.3,
                 line_text_expand_ratio=1.2, curve_text_expand_ratio=1.5):
        self.use_morphology = use_morphology
        self.min_area_size = min_area_size
        self.min_score_threshold = min_score_threshold
        self.binary_region_threshold = binary_region_threshold
        self.line_text_expand_ratio = line_text_expand_ratio
        self.curve_text_expand_ratio = curve_text_expand_ratio

    def __call__(self, preds, sizes):
        """preds [B,H,W,2] (prob, thresh); sizes [B,2] valid (h,w).

        Returns per-image lists of (polygon [N,2], score).
        """
        import cv2
        preds = np.asarray(preds)
        results = []
        for i in range(preds.shape[0]):
            h, w = int(sizes[i][0]), int(sizes[i][1])
            prob = preds[i, :h, :w, 0]
            binary = (prob > self.binary_region_threshold).astype(np.uint8)
            if self.use_morphology:
                kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (3, 3))
                binary = cv2.morphologyEx(binary, cv2.MORPH_CLOSE, kernel)
            contours, _ = cv2.findContours(binary, cv2.RETR_LIST,
                                           cv2.CHAIN_APPROX_SIMPLE)
            boxes = []
            for contour in contours:
                if cv2.contourArea(contour) < self.min_area_size:
                    continue
                mask = np.zeros_like(binary)
                cv2.fillPoly(mask, [contour], 1)
                score = float((prob * mask).sum() / max(mask.sum(), 1))
                if score < self.min_score_threshold:
                    continue
                # line vs curve split: rectangularity of the min-area rect
                rect = cv2.minAreaRect(contour)
                rect_area = max(rect[1][0] * rect[1][1], 1e-4)
                rectangularity = cv2.contourArea(contour) / rect_area
                ratio = self.line_text_expand_ratio if rectangularity > 0.8 \
                    else self.curve_text_expand_ratio
                area = cv2.contourArea(contour)
                perimeter = cv2.arcLength(contour, True)
                d = max(1, int(round(area * ratio / max(perimeter, 1e-4))))
                kernel = cv2.getStructuringElement(
                    cv2.MORPH_ELLIPSE, (2 * d + 1, 2 * d + 1))
                expanded = cv2.dilate(mask, kernel)
                ctrs, _ = cv2.findContours(expanded, cv2.RETR_EXTERNAL,
                                           cv2.CHAIN_APPROX_SIMPLE)
                if not ctrs:
                    continue
                big = max(ctrs, key=cv2.contourArea)
                if rectangularity > 0.8:
                    box = cv2.boxPoints(cv2.minAreaRect(big))
                else:
                    eps = 0.002 * cv2.arcLength(big, True)
                    box = cv2.approxPolyDP(big, eps, True).reshape(-1, 2)
                boxes.append((box.astype(np.float32), score))
            results.append(boxes)
        return results
