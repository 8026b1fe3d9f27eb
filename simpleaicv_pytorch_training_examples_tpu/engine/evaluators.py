"""Reusable per-epoch evaluators for the generic runner."""

from typing import Optional

import numpy as np


def classification_evaluator(model, config, ctx, output_index: Optional[int]
                             = None, topk: int = 5):
    """Top-1/top-k accuracy over ctx.test_loader.

    output_index selects one element when the model returns a tuple (e.g.
    KDModel returns (tea, stu): pass 1 for the student).
    """
    import jax
    import jax.numpy as jnp

    from ..parallel import shard_batch
    from ..parallel.mesh import pad_batch_to_multiple
    from ..utils.meters import AccMeter

    compute_dtype = jnp.bfloat16 if getattr(config, "use_amp", True) \
        else jnp.float32
    use_ema = getattr(config, "use_ema_model", False)

    @jax.jit
    def eval_step(state, batch):
        params = state.ema_params if use_ema else state.params
        out = model.apply({"params": params, **state.variables},
                          batch["image"].astype(compute_dtype), train=False)
        if output_index is not None:
            out = out[output_index]
        logits = out.astype(jnp.float32)
        labels = batch["label"]
        if labels.ndim == 2:  # soft labels -> argmax
            labels = jnp.argmax(labels, axis=-1)
        top1 = jnp.argmax(logits, axis=-1) == labels
        _, topk_idx = jax.lax.top_k(logits, topk)
        return top1, jnp.any(topk_idx == labels[:, None], axis=-1)

    def evaluate(state):
        meter = AccMeter()
        for batch in ctx.test_loader:
            padded, n_real = pad_batch_to_multiple(batch, ctx.n_devices)
            padded = shard_batch(padded, ctx.mesh)
            top1, topk_hit = eval_step(state, padded)
            meter.update(np.asarray(top1)[:n_real].sum(),
                         np.asarray(topk_hit)[:n_real].sum(), n_real)
        return meter.acc1, (f"top1 {meter.acc1:.3f} "
                            f"top{topk} {meter.acc_topk:.3f}")

    return evaluate
