"""Distillation + MAE engine coverage (small shapes, CPU)."""

import numpy as np


def test_kd_model_and_losses():
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.distillation import (
        KDModel, losses)
    from simpleaicv_pytorch_training_examples_tpu.engine import init_model

    model = KDModel(teacher_type="resnet18cifar", student_type="resnet18cifar",
                    freeze_teacher=True, num_classes=10)
    params, variables = init_model(model, (2, 32, 32, 3),
                                   jax.random.PRNGKey(0))
    x = jnp.zeros((4, 32, 32, 3), jnp.float32)
    (tea, stu), _ = model.apply({"params": params, **variables}, x,
                                train=True, mutable=["batch_stats"],
                                rngs={"dropout": jax.random.PRNGKey(0)})
    assert tea.shape == (4, 10) and stu.shape == (4, 10)

    kd = losses.KDLoss(T=4)(stu, tea)
    dml = losses.DMLLoss(T=4)(stu, tea)
    l2 = losses.L2Loss()(stu, tea)
    assert np.isfinite(float(kd)) and np.isfinite(float(dml))
    assert np.isfinite(float(l2))

    # frozen teacher: grads w.r.t. teacher params must be zero
    def loss(params):
        (t, s), _ = model.apply({"params": params, **variables}, x,
                                train=True, mutable=["batch_stats"],
                                rngs={"dropout": jax.random.PRNGKey(0)})
        return losses.KDLoss(T=4)(s, t)

    grads = jax.grad(loss)(params)
    tea_norm = sum(float(jnp.abs(g).sum())
                   for g in jax.tree.leaves(grads["teacher"]))
    stu_norm = sum(float(jnp.abs(g).sum())
                   for g in jax.tree.leaves(grads["student"]))
    assert tea_norm == 0.0
    assert stu_norm > 0.0


def test_mae_forward_and_loss():
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.masked_image_modeling.models.vit_mae import (
        VITMAEPretrainModel)
    from simpleaicv_pytorch_training_examples_tpu.masked_image_modeling.losses import (
        MSELoss)
    from simpleaicv_pytorch_training_examples_tpu.masked_image_modeling.common import (
        MAESelfSupervisedPretrainCollater)

    # tiny MAE: 64px, patch 16 -> 16 tokens
    model = VITMAEPretrainModel(
        patch_size=16, image_size=64, encoder_embedding_planes=64,
        encoder_block_nums=2, encoder_head_nums=2,
        decoder_embedding_planes=32, decoder_block_nums=1,
        decoder_head_nums=2)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init({"params": rng, "masking": rng}, x, train=True)
    pred, mask = model.apply(variables, x, train=True,
                             rngs={"masking": rng})
    assert pred.shape == (2, 16, 16 * 16 * 3)
    assert mask.shape == (2, 16)
    # 75% masked
    assert float(mask.sum()) == 2 * 12

    collater = MAESelfSupervisedPretrainCollater(image_size=64, patch_size=16)
    samples = [{"image": np.random.rand(64, 64, 3).astype(np.float32)}
               for _ in range(2)]
    batch = collater(samples)
    assert batch["label"].shape == (2, 16, 768)
    # per-patch normalized
    np.testing.assert_allclose(batch["label"].mean(-1), 0.0, atol=1e-3)

    loss = MSELoss()(pred, jnp.asarray(batch["label"]), mask)
    assert np.isfinite(float(loss))


def test_mae_patchify_roundtrip_order():
    """Collater patch layout must match the decoder's output layout:
    row-major patches, pixel-major channel-last within a patch."""
    from simpleaicv_pytorch_training_examples_tpu.masked_image_modeling.common import (
        MAESelfSupervisedPretrainCollater)

    img = np.arange(2 * 2 * 3, dtype=np.float32).reshape(2, 2, 3)
    big = np.zeros((4, 4, 3), np.float32)
    big[:2, :2] = img  # patch (0,0)
    collater = MAESelfSupervisedPretrainCollater(image_size=4, patch_size=2,
                                                 norm_label=False)
    batch = collater([{"image": big}])
    # first patch flattens as (p, p, c) row-major
    np.testing.assert_array_equal(batch["label"][0, 0], img.reshape(-1))
