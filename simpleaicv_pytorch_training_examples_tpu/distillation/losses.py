"""Distillation losses.

Parity with /root/reference/SimpleAICV/distillation/losses.py:14-117:
CELoss / OneHotLabelCELoss (re-exported from classification) plus
KDLoss (KL on T-softened logits, batchmean * T^2), DMLLoss (symmetric KL),
L2Loss (MSE on logits). All fp32 with the reference's [1e-4, 1-1e-4]
probability clamps.
"""

import jax
import jax.numpy as jnp

from ..classification.losses import CELoss, OneHotLabelCELoss

__all__ = ["CELoss", "OneHotLabelCELoss", "KDLoss", "DMLLoss", "L2Loss"]


def _clamped_softmax(logits, t):
    p = jax.nn.softmax(logits.astype(jnp.float32) / t, axis=1)
    return jnp.clip(p, 1e-4, 1.0 - 1e-4)


def _kl_batchmean(log_p, q):
    """F.kl_div(log_p, q, reduction='batchmean') = sum q*(log q - log_p)/B."""
    return jnp.sum(q * (jnp.log(q) - log_p)) / log_p.shape[0]


class KDLoss:

    def __init__(self, T):
        self.t = T

    def __call__(self, stu_preds, tea_preds):
        s = jnp.log(_clamped_softmax(stu_preds, self.t))
        t = _clamped_softmax(tea_preds, self.t)
        return _kl_batchmean(s, t) * (self.t**2)


class DMLLoss:

    def __init__(self, T):
        self.t = T

    def __call__(self, stu_preds, tea_preds):
        s = _clamped_softmax(stu_preds, self.t)
        t = _clamped_softmax(tea_preds, self.t)
        loss = (_kl_batchmean(jnp.log(s), t) * (self.t**2) +
                _kl_batchmean(jnp.log(t), s) * (self.t**2)) / 2.0
        return loss


class L2Loss:

    def __call__(self, stu_preds, tea_preds):
        diff = stu_preds.astype(jnp.float32) - tea_preds.astype(jnp.float32)
        return jnp.mean(diff**2)
