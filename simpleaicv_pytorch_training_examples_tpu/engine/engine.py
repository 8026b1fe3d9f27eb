"""Generic SPMD train/eval engine.

This is the TPU-native collapse of the reference's ~20 hand-cloned per-task
train loops (/root/reference/tools/scripts.py:116-275 and friends) into ONE
jitted step function parameterized by a task recipe:

- forward + loss under fp32-params/bf16-compute (replaces AMP+GradScaler —
  bf16 needs no loss scaling);
- gradients of the global-mean loss over batch-sharded inputs: XLA inserts
  the cross-chip psum (replaces DDP bucketed NCCL all-reduce);
- NaN/Inf screening of loss and grads gating a no-op update via jnp.where —
  the SPMD equivalent of the reference's all-reduced skip flag
  (tools/scripts.py:195-205); the flag is globally consistent because the
  loss itself is a global computation;
- gradient accumulation as a lax.scan over microbatches (replaces
  model.no_sync() bookkeeping, tools/scripts.py:166-181);
- EMA shadow update inside the same step (tools/utils.py:145-172);
- the lr schedule lives inside the optimizer, so the whole training step is
  one XLA program with zero host sync.

The reference's per-iteration barrier (scripts.py:207) has no equivalent:
SPMD programs are implicitly synchronous.
"""

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    variables: Any  # non-param collections (batch_stats), possibly {}
    opt_state: Any
    ema_params: Any = None  # None when EMA disabled


def init_model(model, input_shape, rng, train: bool = False):
    """Initialize a flax model; returns (params, other_variables)."""
    dummy = jnp.zeros(input_shape, jnp.float32)
    rngs = {"params": rng, "dropout": rng, "droppath": rng}
    variables = model.init(rngs, dummy, train=train)
    params = variables.pop("params")
    return params, dict(variables)


def apply_pretrained(model, params, logger=None):
    """Apply a pretrained checkpoint recorded by `load_state_dict` on the
    model def (see classification/common.py), name+shape filtered with
    pos-embed resize. Torch .pth and orbax dirs are both accepted."""
    import os

    from ..utils.checkpoint import (flatten_params, load_params_filtered,
                                    load_torch_state_dict)

    def _load_flat(p):
        if os.path.isdir(p):
            import orbax.checkpoint as ocp
            saved = ocp.StandardCheckpointer().restore(p)
            return flatten_params(saved)
        return load_torch_state_dict(p)

    # backbone-only pretrained weights (detection/seg configs): keys are
    # remapped under the 'backbone.' prefix
    bb_path = getattr(model, "backbone_pretrained_path", "")
    if bb_path and os.path.exists(bb_path):
        flat = _load_flat(bb_path)
        if flat:
            flat = {f"backbone.{k}": v for k, v in flat.items()}
            params, loaded, total = load_params_filtered(flat, params,
                                                         logger)
            if logger:
                logger.info(f"backbone pretrained: {loaded}/{total} tensors "
                            f"from {bb_path}")

    path = getattr(model, "_pretrained_path", None)
    if not path:
        return params
    flat = _load_flat(path)
    if flat is None:
        return params
    excluded = getattr(model, "_pretrained_excluded", ())
    if excluded:
        flat = {k: v for k, v in flat.items()
                if not any(e in k for e in excluded)}
    merged, loaded, total = load_params_filtered(flat, params, logger)
    if logger:
        logger.info(f"pretrained load: {loaded}/{total} tensors from {path}")
    return merged


def _tree_finite(tree) -> jnp.ndarray:
    leaves = [jnp.all(jnp.isfinite(l)) for l in jax.tree_util.tree_leaves(tree)]
    flag = leaves[0]
    for l in leaves[1:]:
        flag = jnp.logical_and(flag, l)
    return flag


def make_train_step(model,
                    criterion,
                    tx,
                    accumulation_steps: int = 1,
                    use_ema_model: bool = False,
                    ema_model_decay: float = 0.9999,
                    clip_max_norm: float = 0.0,
                    clip_grad_value: float = 0.0,
                    skip_inf_nan_grad: bool = True,
                    compute_dtype=jnp.bfloat16,
                    loss_fn: Optional[Callable] = None,
                    donate: bool = True,
                    opt_state_shardings=None,
                    param_shardings=None):
    """Build the jitted train step.

    loss_fn overrides the default `criterion(model(image), label)` wiring for
    tasks with richer batches; signature
    ``loss_fn(apply_fn, params, variables, batch, rng) ->
    (loss, (new_variables, loss_dict))``.

    opt_state_shardings (optional): a NamedSharding pytree matching the
    optax state — e.g. parallel.zero1_opt_state_sharding — constrained
    onto the new optimizer state each step so the moment tensors stay
    sharded over the data axis (ZeRO-1) instead of replicated.
    param_shardings (optional, required with opt_state_shardings): the
    params' own shardings, re-constrained onto the updated params so the
    data-sharded updates all-gather back instead of leaking their
    sharding onto the weights.
    """

    has_stats = None  # resolved at trace time from state.variables

    def default_loss_fn(params, variables, batch, rng):
        images = batch["image"].astype(compute_dtype)
        mutable = [k for k in variables.keys()]
        rngs = {"dropout": rng, "droppath": jax.random.fold_in(rng, 1)}
        if mutable:
            out, new_vars = model.apply({"params": params, **variables},
                                        images, train=True, rngs=rngs,
                                        mutable=mutable)
            new_vars = dict(new_vars)
        else:
            out = model.apply({"params": params}, images, train=True,
                              rngs=rngs)
            new_vars = variables
        loss = criterion(out, batch["label"])
        return loss, (new_vars, {"loss": loss})

    fwd = loss_fn if loss_fn is not None else default_loss_fn
    grad_fn = jax.value_and_grad(fwd, has_aux=True)

    def compute_grads(params, variables, batch, rng):
        if accumulation_steps == 1:
            (loss, (new_vars, loss_dict)), grads = grad_fn(
                params, variables, batch, rng)
            return loss, new_vars, loss_dict, grads

        # microbatch scan: batch leading dim = accumulation_steps * micro
        def micro(leaf):
            return leaf.reshape(accumulation_steps,
                                leaf.shape[0] // accumulation_steps,
                                *leaf.shape[1:])

        micro_batches = jax.tree.map(micro, batch)

        def body(carry, mb):
            vars_c, grads_c, loss_c, i = carry
            (loss, (new_vars, _)), grads = grad_fn(
                params, vars_c, mb, jax.random.fold_in(rng, i))
            grads_c = jax.tree.map(jnp.add, grads_c, grads)
            return (new_vars, grads_c, loss_c + loss, i + 1), None

        zero_grads = jax.tree.map(jnp.zeros_like, params)
        (new_vars, grads, loss_sum, _), _ = jax.lax.scan(
            body, (variables, zero_grads, 0.0, 0), micro_batches)
        inv = 1.0 / accumulation_steps
        grads = jax.tree.map(lambda g: g * inv, grads)
        loss = loss_sum * inv
        return loss, new_vars, {"loss": loss}, grads

    def train_step(state: TrainState, batch, rng):
        loss, new_vars, loss_dict, grads = compute_grads(
            state.params, state.variables, batch, rng)

        finite = jnp.isfinite(loss)
        if skip_inf_nan_grad:
            finite = jnp.logical_and(finite, _tree_finite(grads))

        if clip_max_norm > 0:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, clip_max_norm / (gnorm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)
        if clip_grad_value > 0:  # element-wise clip (torch clip_grad_value_)
            grads = jax.tree.map(
                lambda g: jnp.clip(g, -clip_grad_value, clip_grad_value),
                grads)

        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)

        # cooperative skip: keep everything when non-finite
        def pick(new, old):
            return jax.tree.map(
                lambda n, o: jnp.where(finite, n, o), new, old)

        new_params = pick(new_params, state.params)
        new_opt_state = pick(new_opt_state, state.opt_state)
        if opt_state_shardings is not None:
            new_opt_state = jax.lax.with_sharding_constraint(
                new_opt_state, opt_state_shardings)
        if param_shardings is not None:
            new_params = jax.lax.with_sharding_constraint(
                new_params, param_shardings)
        new_vars = pick(new_vars, state.variables)

        new_ema = state.ema_params
        if use_ema_model:
            d = ema_model_decay
            new_ema = jax.tree.map(lambda e, p: d * e + (1.0 - d) * p,
                                   state.ema_params, new_params)

        new_state = state.replace(step=state.step + 1,
                                  params=new_params,
                                  variables=new_vars,
                                  opt_state=new_opt_state,
                                  ema_params=new_ema)
        # mask losses to 0 on a skipped iteration so host-side running sums
        # stay finite (reference semantics: a skipped batch contributes
        # nothing to the logged averages, tools/scripts.py:195-205,250-268)
        metrics = {k: jnp.where(finite, v, jnp.zeros_like(v))
                   for k, v in loss_dict.items()}
        metrics["skipped"] = jnp.logical_not(finite).astype(jnp.float32)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_classification_eval_step(model, topk: int = 5,
                                  compute_dtype=jnp.bfloat16,
                                  use_ema: bool = False):
    """Jitted eval step: per-sample top-1/top-k correctness bools [B]."""

    def eval_step(state: TrainState, batch):
        params = state.ema_params if use_ema else state.params
        images = batch["image"].astype(compute_dtype)
        logits = model.apply({"params": params, **state.variables},
                             images, train=False)
        logits = logits.astype(jnp.float32)
        labels = batch["label"]
        top1 = jnp.argmax(logits, axis=-1) == labels
        _, topk_idx = jax.lax.top_k(logits, topk)
        topk_hit = jnp.any(topk_idx == labels[:, None], axis=-1)
        return top1, topk_hit, logits

    return jax.jit(eval_step)
