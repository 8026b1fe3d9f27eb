"""Classification losses in pure jnp.

Parity with /root/reference/SimpleAICV/classification/losses.py:14-217:
CELoss / FocalCELoss / LabelSmoothCELoss / OneHotLabelCELoss /
SemanticSoftmaxLoss. All losses compute in fp32 regardless of input dtype
(the reference calls ``pred.float()``), take [B, C] logits, and return a
scalar mean.

Loss objects are plain callables (no params), safe to close over inside a
jitted train step.
"""

import jax
import jax.numpy as jnp

__all__ = [
    "CELoss",
    "FocalCELoss",
    "LabelSmoothCELoss",
    "OneHotLabelCELoss",
    "SemanticSoftmaxLoss",
]


class CELoss:
    """Softmax cross entropy with integer labels, mean over batch."""

    def __call__(self, pred, label):
        pred = pred.astype(jnp.float32)
        logp = jax.nn.log_softmax(pred, axis=-1)
        nll = -jnp.take_along_axis(logp, label[:, None], axis=-1)[:, 0]
        return nll.mean()


class FocalCELoss:

    def __init__(self, gamma=2.0):
        self.gamma = gamma

    def __call__(self, pred, label):
        pred = jax.nn.softmax(pred.astype(jnp.float32), axis=-1)
        one_hot = jax.nn.one_hot(label, pred.shape[-1], dtype=jnp.float32)
        pt = jnp.where(one_hot == 1.0, pred, 1.0 - pred)
        focal_weight = (1.0 - pt)**self.gamma
        loss = (-jnp.log(jnp.clip(pred, 1e-12))) * one_hot * focal_weight
        return loss.sum(axis=-1).mean()


class LabelSmoothCELoss:

    def __init__(self, smoothing=0.1):
        self.smoothing = smoothing

    def __call__(self, pred, label):
        pred = pred.astype(jnp.float32)
        num_classes = pred.shape[-1]
        logp = jax.nn.log_softmax(pred, axis=-1)
        one_hot = jax.nn.one_hot(label, num_classes, dtype=jnp.float32)
        smoothed = (1.0 - self.smoothing) * one_hot + \
            self.smoothing / num_classes
        loss = (-logp * smoothed).sum(axis=-1)
        return loss.mean()


class OneHotLabelCELoss:
    """CE with one-hot / soft labels (mixup/cutmix path)."""

    def __call__(self, pred, label):
        pred = pred.astype(jnp.float32)
        logp = jax.nn.log_softmax(pred, axis=-1)
        return (-label * logp).sum(axis=-1).mean()


class SemanticSoftmaxLoss:
    """ImageNet-21K hierarchical semantic softmax loss.

    `semantic_outputs` is a list of per-hierarchy [B, C_i] logits;
    `semantic_labels` is [B, n_hierarchies] with -1 marking invalid levels.
    """

    def __init__(self, normalization_factor_list, smoothing=0.1):
        self.normalization_factor_list = normalization_factor_list
        self.smoothing = smoothing

    def __call__(self, semantic_outputs, semantic_labels):
        total = 0.0
        for i, logits in enumerate(semantic_outputs):
            logits = logits.astype(jnp.float32)
            labels_i = semantic_labels[:, i]
            valid = (labels_i >= 0).astype(jnp.float32)
            safe_labels = jnp.maximum(labels_i, 0)
            num_classes = logits.shape[-1]
            logp = jax.nn.log_softmax(logits, axis=-1)
            one_hot = jax.nn.one_hot(safe_labels, num_classes,
                                     dtype=jnp.float32)
            smoothed = one_hot * (1.0 - self.smoothing) + \
                self.smoothing / num_classes
            ce = (-smoothed * logp).sum(axis=-1) * valid
            total = total + ce.mean() * self.normalization_factor_list[i]
        return total
