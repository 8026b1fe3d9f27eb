"""Semantic segmentation losses (NHWC logits, [B,H,W] integer masks).

Parity with /root/reference/SimpleAICV/semantic_segmentation/losses.py:
CELoss / MultiClassBCELoss / IoULoss / DiceLoss, all with the reference's
[1e-4, 1-1e-4] probability clamps and mean reductions. Preds are NHWC
logits (the reference permutes from NCHW; TPU layout is already NHWC).
"""

import jax
import jax.numpy as jnp

__all__ = ["CELoss", "MultiClassBCELoss", "IoULoss", "DiceLoss"]

_EPS = 1e-4


def _flatten(pred, label):
    num_classes = pred.shape[-1]
    pred = pred.astype(jnp.float32).reshape(-1, num_classes)
    label = label.reshape(-1).astype(jnp.int32)
    one_hot = jax.nn.one_hot(label, num_classes, dtype=jnp.float32)
    return pred, one_hot


class CELoss:

    def __call__(self, pred, label):
        pred, one_hot = _flatten(pred, label)
        p = jnp.clip(jax.nn.softmax(pred, axis=-1), _EPS, 1.0 - _EPS)
        return ((-jnp.log(p)) * one_hot).sum(axis=-1).mean()


class MultiClassBCELoss:

    def __call__(self, pred, label):
        pred, one_hot = _flatten(pred, label)
        p = jnp.clip(jax.nn.sigmoid(pred), _EPS, 1.0 - _EPS)
        bce = -(one_hot * jnp.log(p) + (1.0 - one_hot) * jnp.log(1.0 - p))
        return bce.mean()


class IoULoss:

    def __init__(self, logit_type="softmax"):
        assert logit_type in ("softmax", "sigmoid")
        self.logit_type = logit_type

    def __call__(self, pred, label):
        pred, one_hot = _flatten(pred, label)
        if self.logit_type == "softmax":
            p = jax.nn.softmax(pred, axis=-1)
        else:
            p = jax.nn.sigmoid(pred)
        p = jnp.clip(p, _EPS, 1.0 - _EPS)
        inter = p * one_hot
        iou = inter.sum(axis=1) / jnp.clip(
            p.sum(axis=1) + one_hot.sum(axis=1) - inter.sum(axis=1), _EPS,
            None)
        return (1.0 - iou).mean()


class DiceLoss:

    def __init__(self, logit_type="softmax"):
        assert logit_type in ("softmax", "sigmoid")
        self.logit_type = logit_type

    def __call__(self, pred, label):
        pred, one_hot = _flatten(pred, label)
        if self.logit_type == "softmax":
            p = jax.nn.softmax(pred, axis=-1)
        else:
            p = jax.nn.sigmoid(pred)
        p = jnp.clip(p, _EPS, 1.0 - _EPS)
        inter = p * one_hot
        dice = (2 * inter.sum(axis=1) + _EPS) / (
            p.sum(axis=1) + one_hot.sum(axis=1) + _EPS)
        return (1.0 - dice).mean()
