"""Text recognition losses.

Parity with /root/reference/SimpleAICV/text_recognition/losses.py:21-100:
- CTCLoss: per-sample CTC (optax.ctc_loss, batch-first), optional focal
  weighting pt=exp(-loss), normalized by target lengths and batch;
- ACELoss: aggregation cross-entropy between the time-averaged softmax and
  the label character-count distribution.
"""

import jax
import jax.numpy as jnp
import optax

__all__ = ["CTCLoss", "ACELoss"]


class CTCLoss:

    def __init__(self, blank_index, use_focal_weight=False, gamma=2.0):
        self.blank_index = blank_index
        self.use_focal_weight = use_focal_weight
        self.gamma = gamma

    def __call__(self, preds, targets, target_lengths):
        """preds [B, T, C] logits; targets [B, N] int (0 = padding slot via
        length mask); target_lengths [B]."""
        preds = preds.astype(jnp.float32)
        b, t, _ = preds.shape
        n = targets.shape[1]
        logit_paddings = jnp.zeros((b, t), jnp.float32)
        label_paddings = (jnp.arange(n)[None] >=
                          target_lengths[:, None]).astype(jnp.float32)
        loss = optax.ctc_loss(preds, logit_paddings, targets,
                              label_paddings, blank_id=self.blank_index)
        if self.use_focal_weight:
            pt = jnp.exp(-loss)
            loss = (1.0 - pt)**self.gamma * loss
        loss = loss / jnp.clip(target_lengths.astype(jnp.float32), 1.0,
                               None) / b
        return loss.sum()


class ACELoss:

    def __init__(self, blank_index=0):
        self.blank_index = blank_index

    def __call__(self, preds, targets, target_lengths):
        """Aggregation cross entropy. preds [B,T,C]; targets [B,N]."""
        preds = preds.astype(jnp.float32)
        b, t, c = preds.shape
        probs = jax.nn.softmax(preds, axis=-1)
        agg = probs.sum(axis=1) / t  # [B, C]

        n = targets.shape[1]
        valid = (jnp.arange(n)[None] <
                 target_lengths[:, None]).astype(jnp.float32)
        onehot = jax.nn.one_hot(targets, c, dtype=jnp.float32) * \
            valid[..., None]
        counts = onehot.sum(axis=1)  # [B, C]
        counts = counts.at[:, self.blank_index].set(
            t - target_lengths.astype(jnp.float32))
        dist = counts / t
        return (-dist * jnp.log(jnp.clip(agg, 1e-10, None))).sum(-1).mean()
