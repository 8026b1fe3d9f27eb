"""Classification training entry point.

Parity with /root/reference/tools/train_classification_model.py:33-279:
``python tools/train_classification_model.py --work-dir <exp_dir>`` loads
the experiment's ``train_config.py`` (class config with live objects),
builds the input pipeline and optimizer, resumes from ``checkpoints/latest``
if present, and runs the epoch loop with per-epoch eval, best/latest
checkpointing and rank-0 logging.

TPU-native deltas: jax.distributed bootstrap + Mesh instead of torchrun+DDP,
one jitted SPMD train step instead of the hand-rolled loop, bf16 compute
instead of AMP, Orbax instead of torch.save.
"""

import argparse
import os
import sys
import time

BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(BASE_DIR)


def parse_args():
    parser = argparse.ArgumentParser(description="train classification model")
    parser.add_argument("--work-dir", type=str, required=True,
                        help="path to experiment dir with train_config.py")
    return parser.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from simpleaicv_pytorch_training_examples_tpu.engine import (
        TrainState, apply_pretrained, init_model,
        make_classification_eval_step, make_train_step)
    from simpleaicv_pytorch_training_examples_tpu.data import DataLoader
    from simpleaicv_pytorch_training_examples_tpu.parallel import (
        build_mesh, distributed_init, shard_batch)
    from simpleaicv_pytorch_training_examples_tpu.parallel.mesh import (
        pad_batch_to_multiple)
    from simpleaicv_pytorch_training_examples_tpu.utils import (
        build_optimizer, get_logger, load_config_from_work_dir, set_seed)
    from simpleaicv_pytorch_training_examples_tpu.utils.checkpoint import (
        CheckpointStore)
    from simpleaicv_pytorch_training_examples_tpu.utils.ema import ema_init
    from simpleaicv_pytorch_training_examples_tpu.utils.meters import (
        AccMeter)
    from simpleaicv_pytorch_training_examples_tpu.utils.schedules import (
        schedule_value)

    distributed_init()
    config = load_config_from_work_dir(args.work_dir, "train_config")
    if getattr(config, "use_debug_nans", False):
        # surface the first NaN-producing op (reference keeps
        # cudnn.deterministic instead; SURVEY.md §5 sanitizers row)
        jax.config.update("jax_debug_nans", True)
    set_seed(config.seed)

    work_dir = os.path.abspath(args.work_dir)
    log_dir = os.path.join(work_dir, "log")
    checkpoint_dir = os.path.join(work_dir, "checkpoints")
    is_main = jax.process_index() == 0
    logger = get_logger("train", log_dir) if is_main else None

    def log(msg):
        if logger:
            logger.info(msg)

    for key, value in sorted(config.__dict__.items()):
        if not key.startswith("__"):
            log(f"config: {key} = {value}")

    mesh = build_mesh()
    n_devices = mesh.devices.size
    log(f"mesh: {n_devices} devices, axes {mesh.axis_names}")

    batch_size = config.batch_size
    assert batch_size % n_devices == 0, (
        f"global batch {batch_size} % devices {n_devices} != 0")

    train_loader = DataLoader(
        config.train_dataset, batch_size, config.train_collater,
        shuffle=True, drop_last=True, seed=config.seed,
        num_workers=getattr(config, "num_workers", 8),
        process_index=jax.process_index(),
        process_count=jax.process_count())
    test_loader = DataLoader(
        config.test_dataset, batch_size, config.test_collater,
        shuffle=False, drop_last=False, seed=config.seed,
        num_workers=getattr(config, "num_workers", 8),
        process_index=jax.process_index(),
        process_count=jax.process_count())
    steps_per_epoch = len(train_loader)

    model = config.model
    input_size = getattr(config, "input_image_size", 224)
    if isinstance(input_size, (tuple, list)):
        h, w = input_size
    else:
        h = w = input_size
    params, variables = init_model(model, (2, h, w, 3), jax.random.PRNGKey(
        config.seed))
    params = apply_pretrained(model, params, logger)

    n_params = sum(np.prod(l.shape) for l in jax.tree.leaves(params))
    log(f"model params: {n_params / 1e6:.3f} M")

    tx, group_report = build_optimizer(config, params, steps_per_epoch)
    for group in group_report:
        log(f"param group: lr={group.get('lr')} "
            f"wd={group.get('weight_decay')} "
            f"n={len(group['name'])}")

    use_ema = getattr(config, "use_ema_model", False)
    opt_state = tx.init(params)
    # ZeRO-1 (config.use_zero1): Adam moments sharded over the data axis
    opt_shardings, param_shardings = None, None
    if getattr(config, "use_zero1", False):
        from simpleaicv_pytorch_training_examples_tpu.parallel.mesh import (
            zero1_opt_state_sharding)
        opt_shardings = zero1_opt_state_sharding(opt_state, mesh)
        opt_state = jax.tree.map(jax.device_put, opt_state, opt_shardings)
        from jax.sharding import NamedSharding
        from simpleaicv_pytorch_training_examples_tpu.parallel import (
            replicated_sharding)
        rep = replicated_sharding(mesh)
        param_shardings = jax.tree.map(
            lambda p: p.sharding if isinstance(p.sharding, NamedSharding)
            else rep, params)
        log("zero1: optimizer state sharded over the data axis")
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        variables=variables,
        opt_state=opt_state,
        ema_params=ema_init(params) if use_ema else None)

    accumulation_steps = getattr(config, "accumulation_steps", 1)
    train_step = make_train_step(
        model, config.train_criterion, tx,
        accumulation_steps=accumulation_steps,
        use_ema_model=use_ema,
        ema_model_decay=getattr(config, "ema_model_decay", 0.9999),
        clip_max_norm=getattr(config, "clip_max_norm", 0.0),
        clip_grad_value=getattr(config, "clip_grad_value", 0.0),
        compute_dtype=jnp.bfloat16 if getattr(config, "use_amp", True)
        else jnp.float32,
        opt_state_shardings=opt_shardings,
        param_shardings=param_shardings)
    eval_step = make_classification_eval_step(
        model, compute_dtype=jnp.bfloat16 if getattr(config, "use_amp", True)
        else jnp.float32)

    store = CheckpointStore(checkpoint_dir)
    start_epoch = 1
    best_acc = 0.0
    train_hours = 0.0
    if store.has_latest():
        abstract = {"state": state, "epoch": 0, "best_acc": 0.0,
                    "train_hours": 0.0}
        restored = store.restore_latest(abstract)
        # restored arrays are committed to one device; re-replicate over the
        # mesh so they are compatible with the sharded batch under jit
        from simpleaicv_pytorch_training_examples_tpu.parallel import (
            replicated_sharding)
        state = jax.device_put(restored["state"], replicated_sharding(mesh))
        if opt_shardings is not None:
            state = state.replace(opt_state=jax.tree.map(
                jax.device_put, state.opt_state, opt_shardings))
        start_epoch = int(restored["epoch"]) + 1
        best_acc = float(restored["best_acc"])
        train_hours = float(restored["train_hours"])
        log(f"resumed from epoch {start_epoch - 1}, best acc {best_acc:.3f}")

    base_rng = jax.random.PRNGKey(config.seed + 7)

    scheduler_name, scheduler_params = config.scheduler
    optimizer_name, optimizer_params = config.optimizer

    for epoch in range(start_epoch, config.epochs + 1):
        train_loader.set_epoch(epoch)
        epoch_start = time.time()
        # device-side running sums over EVERY iteration (reference semantics,
        # tools/scripts.py:250-268); materialized once per print interval
        loss_sum, skip_sum, n_iters = None, None, 0
        epoch_loss_avg, skips = 0.0, 0

        for it, batch in enumerate(train_loader):
            batch = shard_batch(batch, mesh)
            rng = jax.random.fold_in(base_rng,
                                     (epoch - 1) * steps_per_epoch + it)
            state, metrics = train_step(state, batch, rng)
            loss_sum = metrics["loss"] if loss_sum is None \
                else loss_sum + metrics["loss"]
            skip_sum = metrics["skipped"] if skip_sum is None \
                else skip_sum + metrics["skipped"]
            n_iters += 1
            last_iter = it + 1 == steps_per_epoch
            if (it + 1) % getattr(config, "print_interval", 100) == 0 \
                    or last_iter:
                skips = int(float(skip_sum))
                epoch_loss_avg = float(loss_sum) / max(1, n_iters - skips)
                if (it + 1) % getattr(config, "print_interval", 100) == 0:
                    lr_now = schedule_value(
                        scheduler_name, scheduler_params, config.epochs,
                        optimizer_params["lr"],
                        (epoch - 1) + it / steps_per_epoch)
                    log(f"epoch {epoch} iter {it + 1}/{steps_per_epoch} "
                        f"lr {lr_now:.6f} loss {float(metrics['loss']):.4f} "
                        f"avg {epoch_loss_avg:.4f} skipped {skips}")

        train_hours += (time.time() - epoch_start) / 3600.0

        # eval
        acc_meter = AccMeter()
        for batch in test_loader:
            padded, n_real = pad_batch_to_multiple(batch, n_devices)
            padded = shard_batch(padded, mesh)
            top1, topk, _ = eval_step(state, padded)
            top1 = np.asarray(top1)[:n_real]
            topk = np.asarray(topk)[:n_real]
            acc_meter.update(top1.sum(), topk.sum(), n_real)
        acc1, acc5 = acc_meter.acc1, acc_meter.acc_topk
        log(f"epoch {epoch}: top1 {acc1:.3f} top5 {acc5:.3f} "
            f"train loss avg {epoch_loss_avg:.4f} hours {train_hours:.2f}")

        if is_main:
            if acc1 > best_acc:
                best_acc = acc1
                store.save_best(jax.device_get(
                    state.ema_params if use_ema else state.params))
            store.save_latest({
                "state": jax.device_get(state),
                "epoch": epoch,
                "best_acc": best_acc,
                "train_hours": train_hours,
            })

    log(f"done: best top1 {best_acc:.3f}")
    return best_acc


if __name__ == "__main__":
    main()
