"""Salient-object detection losses (NHWC sigmoid preds [B,H,W,1],
[B,H,W] 0/1 masks).

Parity with /root/reference/SimpleAICV/salient_object_detection/
losses.py:16-233: BCELoss, OHEMBCELoss (hard-negative mining at 1.5x
positives), BCEIouloss, BCEDiceLoss.

TPU note: OHEM's data-dependent top-k becomes a full sort + rank mask so
the loss stays one static-shape XLA program.
"""

import jax.numpy as jnp

__all__ = ["BCELoss", "OHEMBCELoss", "BCEIouloss", "BCEDiceLoss"]

_EPS = 1e-4


def _prep(pred, label):
    assert pred.shape[-1] == 1
    pred = jnp.clip(pred.astype(jnp.float32).reshape(pred.shape[0], -1),
                    _EPS, 1.0 - _EPS)
    label = label.astype(jnp.float32).reshape(label.shape[0], -1)
    return pred, label


class BCELoss:

    def __call__(self, pred, label):
        pred, label = _prep(pred, label)
        loss = -(label * jnp.log(pred) +
                 (1.0 - label) * jnp.log(1.0 - pred))
        return loss.mean()


class OHEMBCELoss:

    def __init__(self, negative_ratio=1.5):
        self.negative_ratio = negative_ratio

    def __call__(self, pred, label):
        pred, label = _prep(pred, label)
        pred, label = pred.reshape(-1), label.reshape(-1)
        positive = (label > 0).astype(jnp.float32)
        n_pos = positive.sum()
        n_neg = jnp.minimum((1.0 - positive).sum(),
                            n_pos * self.negative_ratio)

        loss = -(label * jnp.log(pred) + (1.0 - label) * jnp.log(1.0 - pred))
        pos_loss = (loss * positive).sum()
        neg_loss = loss * (1.0 - positive)
        # top-k with traced k: sort descending, keep rank < k
        sorted_neg = jnp.sort(neg_loss)[::-1]
        ranks = jnp.arange(sorted_neg.shape[0], dtype=jnp.float32)
        neg_sum = (sorted_neg * (ranks < n_neg)).sum()
        return (pos_loss + neg_sum) / (n_pos + n_neg + _EPS)


class BCEIouloss:

    def __init__(self, smooth=1e-4):
        self.smooth = smooth

    def __call__(self, pred, label):
        pred, label = _prep(pred, label)
        inter = pred * label
        iou = (inter.sum(axis=1) + self.smooth) / (
            pred.sum(axis=1) + label.sum(axis=1) - inter.sum(axis=1) +
            self.smooth)
        return (1.0 - iou).mean()


class BCEDiceLoss:

    def __init__(self, smooth=1e-4):
        self.smooth = smooth

    def __call__(self, pred, label):
        pred, label = _prep(pred, label)
        inter = pred * label
        dice = (2 * inter.sum(axis=1) + self.smooth) / (
            pred.sum(axis=1) + label.sum(axis=1) + self.smooth)
        return (1.0 - dice).mean()
