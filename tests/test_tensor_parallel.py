"""Tensor-parallel sharding over a (data=4, model=2) virtual mesh: the ViT
train step must produce the same loss as pure-DP, with qkv/fc kernels
actually sharded on the model axis."""

import numpy as np
import pytest


def test_vit_tp_matches_dp():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from simpleaicv_pytorch_training_examples_tpu.classification import (
        backbones, losses)
    from simpleaicv_pytorch_training_examples_tpu.engine import init_model
    from simpleaicv_pytorch_training_examples_tpu.parallel.mesh import (
        build_mesh)
    from simpleaicv_pytorch_training_examples_tpu.parallel.sharding_rules import (
        shard_params)

    model = backbones.ViT(16, 64, 2, 2, 4, image_size=64, num_classes=5) \
        if hasattr(backbones, "ViT") else None
    from simpleaicv_pytorch_training_examples_tpu.models.backbones.vit import (
        ViT)
    model = ViT(16, 64, 2, 2, 4, image_size=64, num_classes=5)
    params, variables = init_model(model, (2, 64, 64, 3),
                                   jax.random.PRNGKey(0))
    criterion = losses.CELoss()

    rs = np.random.RandomState(0)
    images = rs.randn(8, 64, 64, 3).astype(np.float32)
    labels = rs.randint(0, 5, 8).astype(np.int32)

    def loss(params, images, labels):
        logits = model.apply({"params": params, **variables},
                             images, train=False)
        return criterion(logits, labels)

    loss_and_grad = jax.jit(jax.value_and_grad(loss))

    # pure DP over 8 devices
    mesh_dp = build_mesh(data_parallel_size=8, model_parallel_size=1)
    x_dp = jax.device_put(jnp.asarray(images),
                          NamedSharding(mesh_dp, P("data")))
    y_dp = jax.device_put(jnp.asarray(labels),
                          NamedSharding(mesh_dp, P("data")))
    l_dp, g_dp = loss_and_grad(params, x_dp, y_dp)

    # DP x TP over (4, 2)
    mesh_tp = build_mesh(data_parallel_size=4, model_parallel_size=2)
    tp_params = shard_params(params, mesh_tp)
    # verify the qkv kernel is actually sharded on the model axis
    qkv = tp_params["block_0"]["attn"]["qkv"]["kernel"]
    assert "model" in str(qkv.sharding.spec)
    x_tp = jax.device_put(jnp.asarray(images),
                          NamedSharding(mesh_tp, P("data")))
    y_tp = jax.device_put(jnp.asarray(labels),
                          NamedSharding(mesh_tp, P("data")))
    l_tp, g_tp = loss_and_grad(tp_params, x_tp, y_tp)

    assert float(l_dp) == pytest.approx(float(l_tp), rel=1e-5)
    g1 = np.asarray(jax.tree.leaves(g_dp)[0])
    g2 = np.asarray(jax.tree.leaves(g_tp)[0])
    np.testing.assert_allclose(g1, g2, atol=1e-5)
