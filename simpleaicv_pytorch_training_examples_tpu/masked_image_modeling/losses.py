"""MAE reconstruction losses (masked-patch MSE/L1).

Parity with /root/reference/SimpleAICV/masked_image_modeling/losses.py:11-46.
pred/label: [B, L, p*p*3]; mask: [B, L] with 1 = masked (loss only there).
"""

import jax.numpy as jnp

__all__ = ["MSELoss", "L1Loss"]


class MSELoss:

    def __call__(self, pred, label, mask):
        pred = pred.astype(jnp.float32)
        label = label.astype(jnp.float32)
        mask = mask.astype(jnp.float32)
        loss = ((pred - label)**2).mean(axis=-1)
        return (loss * mask).sum() / (mask.sum() + 1e-4)


class L1Loss:

    def __call__(self, pred, label, mask):
        pred = pred.astype(jnp.float32)
        label = label.astype(jnp.float32)
        mask = mask.astype(jnp.float32)
        loss = jnp.abs(pred - label).mean(axis=-1)
        return (loss * mask).sum() / (mask.sum() + 1e-4)
