"""In-graph error-driven click sampling, shared by the SAM iterative-prompt
training loop (tools/train_interactive_segmentation_model.py, reference
interactive_segmentation_scripts.py:202-271 sample_random_point) and the
SAM2 point-iteration frames (reference sam2video_train.py:840-911).

The reference draws a uniform random pixel from the FP/FN region with
numpy on host; here the draw is a Gumbel-max over the error map so it
stays inside the jitted step (uniform over the region, same distribution).
"""

import jax
import jax.numpy as jnp

__all__ = ["sample_error_point", "sample_error_points_batch"]


def sample_error_point(rng, pred_mask, gt_mask):
    """Gumbel-max uniform draw from the FP/FN region.

    pred_mask/gt_mask [H, W] {0,1}. Returns [3] (x, y, label):
    label 1 if the point is a false negative (missing foreground) —
    i.e. a positive click — else 0 (negative click on a false positive);
    (-1, -1, -1) when there is no error region."""
    fn = (gt_mask > 0.5) & (pred_mask <= 0.5)
    fp = (gt_mask <= 0.5) & (pred_mask > 0.5)
    error = fn | fp
    flat = error.reshape(-1)
    gumbel = jax.random.gumbel(rng, flat.shape)
    scores = jnp.where(flat, gumbel, -jnp.inf)
    idx = jnp.argmax(scores)
    h, w = pred_mask.shape
    y = (idx // w).astype(jnp.float32)
    x = (idx % w).astype(jnp.float32)
    label = fn.reshape(-1)[idx].astype(jnp.float32)
    has_error = flat.any()
    return jnp.where(has_error,
                     jnp.stack([x, y, label]),
                     jnp.asarray([-1.0, -1.0, -1.0]))


def sample_error_points_batch(rng, pred_masks, gt_masks):
    """Vectorized over the batch: [B,H,W] x2 -> [B,3]."""
    rngs = jax.random.split(rng, pred_masks.shape[0])
    return jax.vmap(sample_error_point)(rngs, pred_masks, gt_masks)
