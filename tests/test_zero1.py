"""ZeRO-1 optimizer-state sharding: identical numerics to the replicated
baseline, with the Adam moments actually sharded over the data axis
(parallel.mesh.zero1_opt_state_sharding + engine opt_state_shardings)."""

import numpy as np
import pytest


def _bits(zero1):
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.classification import (
        backbones, losses)
    from simpleaicv_pytorch_training_examples_tpu.engine import (
        TrainState, init_model, make_train_step)
    from simpleaicv_pytorch_training_examples_tpu.parallel import (
        build_mesh, shard_batch)
    from simpleaicv_pytorch_training_examples_tpu.parallel.mesh import (
        zero1_opt_state_sharding)
    from simpleaicv_pytorch_training_examples_tpu.utils.optimizers import (
        build_optimizer)

    mesh = build_mesh(model_parallel_size=1)
    model = backbones.resnet18cifar(num_classes=10)
    params, variables = init_model(model, (2, 32, 32, 3),
                                   jax.random.PRNGKey(0))

    class cfg:
        optimizer = ("AdamW", {"lr": 1e-3, "global_weight_decay": False,
                               "weight_decay": 0.01,
                               "no_weight_decay_layer_name_list": []})
        scheduler = ("CosineLR", {"warm_up_epochs": 0, "min_lr": 1e-3})
        epochs = 1

    tx, _ = build_optimizer(cfg, params, steps_per_epoch=10)
    opt_state = tx.init(params)
    shardings = None
    if zero1:
        shardings = zero1_opt_state_sharding(opt_state, mesh)
        opt_state = jax.tree.map(jax.device_put, opt_state, shardings)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      variables=variables, opt_state=opt_state,
                      ema_params=None)
    step = make_train_step(model, losses.CELoss(), tx,
                           compute_dtype=jnp.float32, donate=False,
                           opt_state_shardings=shardings)
    rs = np.random.RandomState(0)
    batch = shard_batch({
        "image": rs.rand(16, 32, 32, 3).astype(np.float32),
        "label": rs.randint(0, 10, (16,)),
    }, mesh)
    rng = jax.random.PRNGKey(1)
    for i in range(3):
        state, metrics = step(state, batch, jax.random.fold_in(rng, i))
    return state, float(metrics["loss"]), mesh


def test_zero1_matches_replicated_and_shards_moments():
    import jax

    s_rep, loss_rep, _ = _bits(zero1=False)
    s_z1, loss_z1, mesh = _bits(zero1=True)

    # sharding the update math changes XLA's fusion/reduction order, so
    # allow fp32 compilation-level drift; semantics must match
    assert loss_z1 == pytest.approx(loss_rep, rel=1e-3)
    for a, b in zip(jax.tree.leaves(s_rep.params),
                    jax.tree.leaves(s_z1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3)

    # the big moment tensors really are sharded over `data`
    n_dp = mesh.shape["data"]
    sharded = 0
    for leaf in jax.tree.leaves(s_z1.opt_state):
        if hasattr(leaf, "sharding") and leaf.ndim >= 1 and \
                any(s >= n_dp and s % n_dp == 0 for s in leaf.shape):
            spec = leaf.sharding.spec
            assert "data" in tuple(p for p in spec if p), (
                leaf.shape, spec)
            sharded += 1
    assert sharded > 10  # conv kernels' mu and nu trees
