"""SAM encoder distillation loss.

Parity with /root/reference/SimpleAICV/interactive_segmentation/
distill_losses.py:10-25: mean MSE between teacher and student encoder
feature maps.
"""

import jax.numpy as jnp

__all__ = ["MSELoss"]


class MSELoss:

    def __call__(self, tea_preds, stu_preds):
        diff = stu_preds.astype(jnp.float32) - tea_preds.astype(jnp.float32)
        return {"distill_mse_loss": jnp.mean(diff**2)}
