"""Universal segmentation decode.

Parity with /root/reference/SimpleAICV/universal_segmentation/
segmentation_decode.py:19-120 (UniversalSegmentationDecoder):
- semantic mode: per-pixel class = einsum of class probs (no-object
  dropped) with mask sigmoid probs, argmax;
- instance mode: per-query (class, score, binary mask) filtered by score.
"""

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["UniversalSegmentationDecoder"]


class UniversalSegmentationDecoder:

    def __init__(self, num_classes=151, mode="semantic",
                 min_score_threshold=0.3, mask_threshold=0.5,
                 max_object_num=100):
        assert mode in ("semantic", "instance")
        self.num_classes = num_classes
        self.mode = mode
        self.min_score_threshold = min_score_threshold
        self.mask_threshold = mask_threshold
        self.max_object_num = max_object_num

        @jax.jit
        def semantic(mask_preds, class_preds):
            probs = jax.nn.softmax(class_preds.astype(jnp.float32),
                                   axis=-1)[..., :-1]  # drop no-object
            masks = jax.nn.sigmoid(mask_preds.astype(jnp.float32))
            seg = jnp.einsum("bqc,bqhw->bchw", probs, masks)
            return jnp.argmax(seg, axis=1)

        @jax.jit
        def instance(mask_preds, class_preds):
            probs = jax.nn.softmax(class_preds.astype(jnp.float32),
                                   axis=-1)[..., :-1]
            scores = probs.max(axis=-1)
            classes = probs.argmax(axis=-1).astype(jnp.float32)
            keep = scores > self.min_score_threshold
            scores = jnp.where(keep, scores, -1.0)
            classes = jnp.where(keep, classes, -1.0)
            masks = (jax.nn.sigmoid(mask_preds.astype(jnp.float32)) >
                     self.mask_threshold).astype(jnp.float32)
            masks = masks * keep[:, :, None, None]
            return scores, classes, masks

        self._semantic = semantic
        self._instance = instance

    def __call__(self, preds):
        mask_preds, class_preds = preds
        if self.mode == "semantic":
            return np.asarray(self._semantic(jnp.asarray(mask_preds),
                                             jnp.asarray(class_preds)))
        scores, classes, masks = self._instance(jnp.asarray(mask_preds),
                                                jnp.asarray(class_preds))
        return [np.asarray(scores), np.asarray(classes), np.asarray(masks)]
