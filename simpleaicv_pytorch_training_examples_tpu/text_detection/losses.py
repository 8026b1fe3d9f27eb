"""DBNet loss.

Parity with /root/reference/SimpleAICV/text_detection/losses.py:17-160
(DBNetLoss): OHEM-BCE on the probability map (3:1 hard negatives), masked
L1 on the threshold map, dice on the differentiable binary map
1/(1+exp(-k*(P-T))). Preds NHWC [B,H,W,2]; shapes dict carries the
probability/threshold target masks and ignore masks from target generation.

TPU note: the dynamic top-k hard-negative selection becomes sort+rank-mask.
"""

import jax.numpy as jnp

__all__ = ["DBNetLoss"]

_EPS = 1e-4


class DBNetLoss:

    def __init__(self, probability_weight=1, threshold_weight=5,
                 binary_weight=1, negative_ratio=3, k=50):
        self.probability_weight = probability_weight
        self.threshold_weight = threshold_weight
        self.binary_weight = binary_weight
        self.negative_ratio = negative_ratio
        self.k = k

    def __call__(self, preds, shapes):
        probability_map = preds[..., 0].astype(jnp.float32)
        threshold_map = preds[..., 1].astype(jnp.float32)
        binary_map = 1.0 / (1.0 + jnp.exp(
            -self.k * (probability_map - threshold_map)))
        probability_map = jnp.clip(probability_map, _EPS, 1.0 - _EPS)

        prob_mask = shapes["probability_mask"].astype(jnp.float32)
        prob_ignore = shapes["probability_ignore_mask"].astype(jnp.float32)
        thresh_mask = shapes["threshold_mask"].astype(jnp.float32)
        thresh_ignore = shapes["threshold_ignore_mask"].astype(jnp.float32)

        prob_loss = self._probability_loss(probability_map, prob_mask,
                                           prob_ignore)
        thresh_loss = self._threshold_loss(threshold_map, thresh_mask,
                                           thresh_ignore)
        binary_loss = self._binary_loss(binary_map, prob_mask, prob_ignore)

        return {
            "probability_map_loss": self.probability_weight * prob_loss,
            "threshold_map_loss": self.threshold_weight * thresh_loss,
            "binary_map_loss": self.binary_weight * binary_loss,
        }

    def _probability_loss(self, p, mask, ignore):
        positive = (mask * ignore).reshape(-1)
        negative = ((1.0 - mask) * ignore).reshape(-1)
        n_pos = positive.sum()
        n_neg = jnp.minimum(negative.sum(), n_pos * self.negative_ratio)

        bce = -(mask * jnp.log(p) + (1.0 - mask) * jnp.log(1.0 - p))
        bce = bce.reshape(-1)
        pos_sum = (bce * positive).sum()
        neg_loss = bce * negative
        sorted_neg = jnp.sort(neg_loss)[::-1]
        ranks = jnp.arange(sorted_neg.shape[0], dtype=jnp.float32)
        neg_sum = (sorted_neg * (ranks < n_neg)).sum()
        total = (pos_sum + neg_sum) / jnp.clip(n_pos + n_neg, 1.0, None)
        return jnp.where(n_pos + n_neg > 0, total, 0.0)

    @staticmethod
    def _threshold_loss(t, mask, ignore):
        denom = ignore.sum()
        loss = (jnp.abs(t - mask) * ignore).sum() / jnp.clip(denom, 1.0,
                                                             None)
        return jnp.where(denom > 0, loss, 0.0)

    @staticmethod
    def _binary_loss(b, mask, ignore):
        n_pos = (mask * ignore).sum()
        b = jnp.clip(b, _EPS, 1.0 - _EPS)
        bm = b * ignore
        mm = mask * ignore
        inter = (bm * mm).sum()
        dice = 1.0 - (2.0 * inter + _EPS) / (bm.sum() + mm.sum() + _EPS)
        return jnp.where(n_pos > 0, dice, 0.0)
