"""SAM automatic mask generation ("predict everything").

Parity with the reference's predict-everything notebooks
(/root/reference/13.interactive_segmentation_training/sam_predict_example/
*.ipynb — grid-prompt mode): a regular point grid is swept over the image,
every point decoded as an independent prompt, and the resulting masks are
filtered by predicted IoU + stability score and deduplicated with
box-NMS over mask bounding boxes.

TPU design: the image is encoded ONCE; all grid prompts go through the
prompt-encoder/mask-decoder in fixed-shape batches (the decoder is tiny
next to the encoder, so a 32x32 grid is ~16 batched decoder calls at
batch 64); filtering is mask arithmetic on device; only the final NMS and
RLE packing run on host.
"""

import numpy as np

__all__ = ["SAMAutomaticMaskGenerator"]


class SAMAutomaticMaskGenerator:

    def __init__(self, model, variables, points_per_side=32,
                 points_per_batch=64, pred_iou_thresh=0.88,
                 stability_score_thresh=0.95, stability_offset=1.0,
                 nms_iou_thresh=0.7, min_mask_area=0):
        import jax

        self.model = model
        self.variables = dict(variables)
        self.points_per_side = points_per_side
        self.points_per_batch = points_per_batch
        self.pred_iou_thresh = pred_iou_thresh
        self.stability_score_thresh = stability_score_thresh
        self.stability_offset = stability_offset
        self.nms_iou_thresh = nms_iou_thresh
        self.min_mask_area = min_mask_area

        params = self.variables.pop("params")
        self._params = params

        @jax.jit
        def encode(params, image):
            return model.apply({"params": params, **self.variables}, image,
                               method=type(model).forward_image_encoder)

        @jax.jit
        def decode_points(params, embedding, points):
            """embedding [1,h,w,C]; points [B,3] -> per-prompt best mask
            stats: (mask_low [B,H,W] bool, iou [B], stability [B])."""
            import jax.numpy as jnp
            b = points.shape[0]
            emb = jnp.broadcast_to(embedding,
                                   (b, *embedding.shape[1:]))
            prompts = {"prompt_point": points[:, None, :],
                       "prompt_box": None, "prompt_mask": None}
            # SAM returns (masks, ious); SAM2Image additionally returns
            # object logits — take the first two either way
            out = model.apply(
                {"params": params, **self.variables}, emb, prompts,
                method=type(model).forward_prompt_encoder_mask_decoder)
            masks, ious = out[0], out[1]
            # pick best of the multimask outputs per prompt
            best = jnp.argmax(ious, axis=-1)
            bidx = jnp.arange(b)
            logits = masks[bidx, best]
            iou = ious[bidx, best]
            pos = (logits > 0).sum(axis=(1, 2)).astype(jnp.float32)
            loose = (logits > -self.stability_offset).sum(
                axis=(1, 2)).astype(jnp.float32)
            tight = (logits > self.stability_offset).sum(
                axis=(1, 2)).astype(jnp.float32)
            stability = tight / jnp.clip(loose, 1.0, None)
            return logits > 0, iou, stability, pos

        self._encode = encode
        self._decode_points = decode_points

    def _grid_points(self, size):
        n = self.points_per_side
        offset = size / (2 * n)
        coords = np.linspace(offset, size - offset, n)
        gx, gy = np.meshgrid(coords, coords)
        pts = np.stack([gx.ravel(), gy.ravel(),
                        np.ones(n * n)], axis=-1)
        return pts.astype(np.float32)

    @staticmethod
    def _mask_box(mask):
        ys, xs = np.nonzero(mask)
        if len(ys) == 0:
            return np.zeros(4, np.float32)
        return np.array([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1],
                        np.float32)

    def _box_nms(self, boxes, scores):
        order = np.argsort(-scores)
        keep = []
        while len(order):
            i = order[0]
            keep.append(i)
            if len(order) == 1:
                break
            rest = order[1:]
            xx0 = np.maximum(boxes[i, 0], boxes[rest, 0])
            yy0 = np.maximum(boxes[i, 1], boxes[rest, 1])
            xx1 = np.minimum(boxes[i, 2], boxes[rest, 2])
            yy1 = np.minimum(boxes[i, 3], boxes[rest, 3])
            inter = np.clip(xx1 - xx0, 0, None) * np.clip(yy1 - yy0, 0,
                                                          None)
            a_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a_r = (boxes[rest, 2] - boxes[rest, 0]) * \
                (boxes[rest, 3] - boxes[rest, 1])
            iou = inter / np.clip(a_i + a_r - inter, 1e-6, None)
            order = rest[iou <= self.nms_iou_thresh]
        return keep

    def generate(self, image):
        """image [H,W,3] float (already resized to model.image_size and
        normalized) -> list of dicts with 'mask' [H,W] bool,
        'predicted_iou', 'stability_score', 'bbox', 'area'."""
        import jax.numpy as jnp

        size = self.model.image_size
        embedding = self._encode(self._params, jnp.asarray(image[None]))
        points = self._grid_points(size)

        all_masks, all_iou, all_stab = [], [], []
        bs = self.points_per_batch
        n = len(points)
        pad = (-n) % bs
        if pad:
            points = np.concatenate([points, points[:pad]], axis=0)
        for i in range(0, len(points), bs):
            m, iou, stab, pos = self._decode_points(
                self._params, embedding, jnp.asarray(points[i:i + bs]))
            keep = np.asarray((iou > self.pred_iou_thresh) &
                              (stab > self.stability_score_thresh) &
                              (pos > self.min_mask_area))
            m = np.asarray(m)
            for j in np.nonzero(keep)[0]:
                if i + j >= n:
                    continue  # padding prompts
                all_masks.append(m[j])
                all_iou.append(float(np.asarray(iou)[j]))
                all_stab.append(float(np.asarray(stab)[j]))

        if not all_masks:
            return []
        boxes = np.stack([self._mask_box(m) for m in all_masks])
        scores = np.asarray(all_iou)
        keep = self._box_nms(boxes, scores)
        out = []
        for i in keep:
            out.append({"mask": all_masks[i],
                        "predicted_iou": all_iou[i],
                        "stability_score": all_stab[i],
                        "bbox": boxes[i].tolist(),
                        "area": int(all_masks[i].sum())})
        return out
