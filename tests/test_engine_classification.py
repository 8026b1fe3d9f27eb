"""End-to-end engine test: ResNet18Cifar on synthetic data over an 8-device
CPU mesh — covers init, sharded train steps, NaN-skip, EMA, eval, schedules.
"""

import numpy as np
import pytest


def _build(num_classes=10, use_ema=False, accumulation_steps=1,
           optimizer=("SGD", {"lr": 0.1, "momentum": 0.9,
                              "global_weight_decay": False,
                              "weight_decay": 5e-4,
                              "no_weight_decay_layer_name_list": []}),
           scheduler=("MultiStepLR", {"warm_up_epochs": 0, "gamma": 0.2,
                                      "milestones": [60, 120]})):
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.classification import (
        backbones, losses)
    from simpleaicv_pytorch_training_examples_tpu.engine import (
        TrainState, init_model, make_train_step,
        make_classification_eval_step)
    from simpleaicv_pytorch_training_examples_tpu.utils.optimizers import (
        build_optimizer)
    from simpleaicv_pytorch_training_examples_tpu.utils.ema import ema_init

    model = backbones.__dict__["resnet18cifar"](num_classes=num_classes)
    params, variables = init_model(model, (2, 32, 32, 3),
                                   jax.random.PRNGKey(0))

    class cfg:
        pass

    cfg.optimizer = optimizer
    cfg.scheduler = scheduler
    cfg.epochs = 200
    tx, report = build_optimizer(cfg, params, steps_per_epoch=10)
    opt_state = tx.init(params)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       variables=variables, opt_state=opt_state,
                       ema_params=ema_init(params) if use_ema else None)
    criterion = losses.CELoss()
    train_step = make_train_step(model, criterion, tx,
                                 accumulation_steps=accumulation_steps,
                                 use_ema_model=use_ema,
                                 compute_dtype=jnp.float32, donate=False)
    eval_step = make_classification_eval_step(model,
                                              compute_dtype=jnp.float32)
    return model, state, train_step, eval_step, report


def _batch(bs=16, num_classes=10, seed=0):
    rs = np.random.RandomState(seed)
    labels = rs.randint(0, num_classes, bs)
    images = rs.randn(bs, 32, 32, 3).astype(np.float32) * 0.1 + \
        labels[:, None, None, None] / num_classes
    return {"image": images, "label": labels.astype(np.int32)}


def test_train_step_runs_and_loss_decreases():
    import jax
    from simpleaicv_pytorch_training_examples_tpu.parallel import (
        build_mesh, shard_batch)

    model, state, train_step, eval_step, _ = _build()
    mesh = build_mesh()
    assert mesh.devices.size == 8

    batch = shard_batch(_batch(bs=32), mesh)
    losses_seen = []
    rng = jax.random.PRNGKey(1)
    for i in range(40):
        state, metrics = train_step(state, batch,
                                    jax.random.fold_in(rng, i))
        losses_seen.append(float(metrics["loss"]))
        assert float(metrics["skipped"]) == 0.0
    assert losses_seen[-1] < losses_seen[0], losses_seen

    top1, topk, _ = eval_step(state, batch)
    assert top1.shape == (32,)
    # overfitting one batch: well above 10-class chance
    assert float(np.mean(np.asarray(top1))) >= 0.3


def test_nan_batch_is_skipped():
    import jax
    import numpy as np

    model, state, train_step, _, _ = _build()
    batch = _batch(bs=16)
    good_params = jax.tree.leaves(state.params)[0].copy()
    batch["image"][0, 0, 0, 0] = np.nan
    state2, metrics = train_step(state, batch, jax.random.PRNGKey(0))
    assert float(metrics["skipped"]) == 1.0
    # params unchanged
    p2 = jax.tree.leaves(state2.params)[0]
    np.testing.assert_array_equal(np.asarray(p2), np.asarray(good_params))


def test_gradient_accumulation_matches_big_batch():
    import jax
    import numpy as np

    _, state, step1, _, _ = _build(accumulation_steps=1)
    _, state4, step4, _, _ = _build(accumulation_steps=4)

    batch = _batch(bs=32)
    rng = jax.random.PRNGKey(0)
    s1, m1 = step1(state, batch, rng)
    s4, m4 = step4(state4, batch, rng)
    # same data, same init -> losses close (BN stats differ slightly between
    # whole-batch and microbatch stats, so tolerance is loose)
    assert abs(float(m1["loss"]) - float(m4["loss"])) < 0.2


def test_ema_updates():
    import jax
    import numpy as np

    _, state, train_step, _, _ = _build(use_ema=True)
    batch = _batch(bs=16)
    state2, _ = train_step(state, batch, jax.random.PRNGKey(0))
    e0 = np.asarray(jax.tree.leaves(state.ema_params)[0])
    e1 = np.asarray(jax.tree.leaves(state2.ema_params)[0])
    assert not np.array_equal(e0, e1)


def test_optimizer_report_groups():
    _, _, _, _, report = _build()
    # 1-D params (bn/bias) must be in a wd=0 group
    wds = {g["weight_decay"] for g in report}
    assert 0.0 in wds and 5e-4 in wds
