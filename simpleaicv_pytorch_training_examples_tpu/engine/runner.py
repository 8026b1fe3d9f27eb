"""Generic work-dir training runner.

One engine for what the reference implements as 28 near-identical entry
points + ~20 cloned per-task loops (tools/train_*_model.py,
tools/*_scripts.py). A task provides a `Recipe`:

- ``build_loss_fn(model, config)`` -> engine loss_fn (or None to use the
  default `criterion(model(image), label)` wiring);
- ``evaluate(state, config, ctx)`` -> (metric_scalar, log_str) run after
  each epoch (or None to skip eval);
- ``init_shape(config)`` -> dummy input shape for param init.

Everything else (mesh, loaders, optimizer, checkpointing, resume, logging)
is shared and identical to tools/train_classification_model.py.
"""

import os
import time
from dataclasses import dataclass
from typing import Any, Callable, Optional

import numpy as np


@dataclass
class RunContext:
    mesh: Any
    eval_step: Any
    test_loader: Any
    logger: Any
    n_devices: int


def run_training(config, work_dir: str, *,
                 build_loss_fn: Optional[Callable] = None,
                 build_eval: Optional[Callable] = None,
                 init_fn: Optional[Callable] = None,
                 init_shape: Optional[tuple] = None,
                 extra_rngs: tuple = (),
                 higher_is_better: bool = True):
    import jax
    import jax.numpy as jnp

    from ..data import DataLoader
    from ..parallel import (build_mesh, distributed_init, replicated_sharding,
                            shard_batch)
    from ..utils import (build_optimizer, get_logger, set_seed)
    from ..utils.checkpoint import CheckpointStore
    from ..utils.ema import ema_init
    from .engine import TrainState, apply_pretrained, init_model, \
        make_train_step

    distributed_init()
    if getattr(config, "use_debug_nans", False):
        # surface the first NaN-producing op (reference keeps
        # cudnn.deterministic instead; SURVEY.md §5 sanitizers row)
        jax.config.update("jax_debug_nans", True)
    set_seed(config.seed)

    work_dir = os.path.abspath(work_dir)
    is_main = jax.process_index() == 0
    logger = get_logger("train", os.path.join(work_dir, "log")) \
        if is_main else None

    def log(msg):
        if logger:
            logger.info(msg)

    for key, value in sorted(vars(config).items()
                             if not isinstance(config, type)
                             else config.__dict__.items()):
        if not key.startswith("__"):
            log(f"config: {key} = {value}")

    mesh = build_mesh()
    n_devices = mesh.devices.size
    log(f"mesh: {n_devices} devices")
    assert config.batch_size % n_devices == 0

    train_loader = DataLoader(
        config.train_dataset, config.batch_size, config.train_collater,
        shuffle=True, drop_last=True, seed=config.seed,
        num_workers=getattr(config, "num_workers", 8),
        process_index=jax.process_index(),
        process_count=jax.process_count())
    test_loader = None
    if getattr(config, "test_dataset", None) is not None:
        eval_collater = getattr(config, "test_collater",
                                config.train_collater)
        # a collater that augments in-collate (e.g. Mixup/CutMix) would
        # corrupt eval if it leaked in through the fallback
        assert not getattr(eval_collater, "augments", False), (
            "config.train_collater performs random augmentation; set an "
            "explicit config.test_collater for the eval loader")
        test_loader = DataLoader(
            config.test_dataset, config.batch_size,
            eval_collater,
            shuffle=False, drop_last=False, seed=config.seed,
            num_workers=getattr(config, "num_workers", 8),
            process_index=jax.process_index(),
            process_count=jax.process_count())
    steps_per_epoch = len(train_loader)

    model = config.model
    if init_fn is not None:
        params, variables = init_fn(model, config,
                                    jax.random.PRNGKey(config.seed))
    else:
        if init_shape is None:
            s = getattr(config, "input_image_size", 224)
            hw = (s, s) if isinstance(s, int) else tuple(s)
            init_shape = (2, hw[0], hw[1], 3)
        params, variables = init_model(model, init_shape,
                                       jax.random.PRNGKey(config.seed))
    params = apply_pretrained(model, params, logger)
    n_params = sum(np.prod(l.shape) for l in jax.tree.leaves(params))
    log(f"model params: {n_params / 1e6:.3f} M")

    tx, group_report = build_optimizer(config, params, steps_per_epoch)
    for group in group_report:
        log(f"param group: lr={group.get('lr')} "
            f"wd={group.get('weight_decay')} n={len(group['name'])}")

    use_ema = getattr(config, "use_ema_model", False)
    opt_state = tx.init(params)
    # ZeRO-1: shard the optimizer moments over the data axis — cuts the
    # Adam-class optimizer memory per chip by the DP degree
    opt_shardings, param_shardings = None, None
    if getattr(config, "use_zero1", False):
        from ..parallel.mesh import zero1_opt_state_sharding
        opt_shardings = zero1_opt_state_sharding(opt_state, mesh)
        opt_state = jax.tree.map(jax.device_put, opt_state, opt_shardings)
        from jax.sharding import NamedSharding
        rep = replicated_sharding(mesh)
        param_shardings = jax.tree.map(
            lambda p: p.sharding if isinstance(p.sharding, NamedSharding)
            else rep, params)
        log("zero1: optimizer state sharded over the data axis")
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       variables=variables, opt_state=opt_state,
                       ema_params=ema_init(params) if use_ema else None)

    loss_fn = build_loss_fn(model, config) if build_loss_fn else None
    compute_dtype = jnp.bfloat16 if getattr(config, "use_amp", True) \
        else jnp.float32
    train_step = make_train_step(
        model, getattr(config, "train_criterion", None), tx,
        accumulation_steps=getattr(config, "accumulation_steps", 1),
        use_ema_model=use_ema,
        ema_model_decay=getattr(config, "ema_model_decay", 0.9999),
        clip_max_norm=getattr(config, "clip_max_norm", 0.0),
        clip_grad_value=getattr(config, "clip_grad_value", 0.0),
        skip_inf_nan_grad=getattr(config, "skip_inf_nan_grad", True),
        compute_dtype=compute_dtype,
        loss_fn=loss_fn,
        opt_state_shardings=opt_shardings,
        param_shardings=param_shardings)

    evaluator = None
    if build_eval:
        evaluator = build_eval(model, config,
                               RunContext(mesh, None, test_loader, logger,
                                          n_devices))

    store = CheckpointStore(os.path.join(work_dir, "checkpoints"))
    start_epoch, best_metric, train_hours = 1, None, 0.0
    if store.has_latest():
        abstract = {"state": state, "epoch": 0, "best_metric": 0.0,
                    "train_hours": 0.0}
        restored = store.restore_latest(abstract)
        state = jax.device_put(restored["state"], replicated_sharding(mesh))
        if opt_shardings is not None:
            state = state.replace(opt_state=jax.tree.map(
                jax.device_put, restored["state"].opt_state, opt_shardings))
        start_epoch = int(restored["epoch"]) + 1
        best_metric = float(restored["best_metric"])
        train_hours = float(restored["train_hours"])
        log(f"resumed from epoch {start_epoch - 1}")

    def host_tree(tree):
        """Materialize a state pytree to host numpy for checkpointing.
        device_get raises on non-fully-addressable arrays (ZeRO-1 moments
        sharded across processes), so those are allgathered first."""
        if jax.process_count() == 1:
            return jax.device_get(tree)
        from jax.experimental import multihost_utils

        def fetch(x):
            if hasattr(x, "is_fully_addressable") \
                    and not x.is_fully_addressable:
                return multihost_utils.process_allgather(x, tiled=True)
            return jax.device_get(x)

        return jax.tree.map(fetch, tree)

    base_rng = jax.random.PRNGKey(config.seed + 7)
    eval_epochs = getattr(config, "eval_epochs", None)  # None = every epoch
    save_interval = getattr(config, "save_interval", None)
    print_interval = getattr(config, "print_interval", 100)

    for epoch in range(start_epoch, config.epochs + 1):
        train_loader.set_epoch(epoch)
        t_epoch = time.time()
        # device-side running sums over EVERY iteration (reference
        # accumulates each iter, tools/scripts.py:250-268); the host only
        # materializes them at print_interval / epoch end, so there is one
        # scalar transfer per interval, not per iteration.
        metric_sums, n_iters = None, 0
        epoch_loss_avg, skips = 0.0, 0
        for it, batch in enumerate(train_loader):
            batch = shard_batch(batch, mesh)
            rng = jax.random.fold_in(base_rng,
                                     (epoch - 1) * steps_per_epoch + it)
            state, metrics = train_step(state, batch, rng)
            metric_sums = metrics if metric_sums is None else jax.tree.map(
                jnp.add, metric_sums, metrics)
            n_iters += 1
            last_iter = it + 1 == steps_per_epoch
            if (it + 1) % print_interval == 0 or last_iter:
                sums = jax.device_get(metric_sums)
                skips = int(sums.pop("skipped"))
                valid = max(1, n_iters - skips)
                avgs = {k: float(v) / valid for k, v in sums.items()}
                epoch_loss_avg = avgs["loss"]
                extra = " ".join(f"{k} {v:.4f}" for k, v in avgs.items()
                                 if k != "loss")
                if not last_iter or (it + 1) % print_interval == 0:
                    log(f"epoch {epoch} iter {it + 1}/{steps_per_epoch} "
                        f"loss {float(metrics['loss']):.4f} "
                        f"avg {epoch_loss_avg:.4f} {extra} skipped {skips}")
        train_hours += (time.time() - t_epoch) / 3600.0

        metric = None
        if evaluator and (eval_epochs is None or epoch in eval_epochs):
            metric, metric_log = evaluator(state)
            log(f"epoch {epoch}: {metric_log} "
                f"train loss avg {epoch_loss_avg:.4f} "
                f"hours {train_hours:.2f}")
        else:
            metric = -epoch_loss_avg if higher_is_better else epoch_loss_avg
            log(f"epoch {epoch}: train loss avg {epoch_loss_avg:.4f} "
                f"hours {train_hours:.2f}")

        # checkpoint saves are COLLECTIVE: every process calls store.save_*
        # (metric is psum'd/replicated so `improved` agrees everywhere);
        # orbax writes from the primary host only — the multi-process
        # equivalent of the reference's rank-0 torch.save
        # (/root/reference/tools/train_classification_model.py:229-262)
        improved = (best_metric is None or
                    (metric > best_metric if higher_is_better
                     else metric < best_metric))
        if metric is not None and improved:
            best_metric = metric
            store.save_best(host_tree(
                state.ema_params if use_ema else state.params))
        if save_interval is None or epoch % save_interval == 0 \
                or epoch == config.epochs:
            store.save_latest({
                "state": host_tree(state),
                "epoch": epoch,
                "best_metric": best_metric if best_metric is not None
                else 0.0,
                "train_hours": train_hours,
            })

    log(f"done: best metric {best_metric}")
    return best_metric, state
