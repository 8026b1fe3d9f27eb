"""Universal segmentation (DINOv3 + query injection) coverage."""

import numpy as np
import pytest


def test_universal_segmentation_forward_loss_decode():
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.universal_segmentation.models import (
        UniversalSegmentation)
    from simpleaicv_pytorch_training_examples_tpu.universal_segmentation.segmentation_losses import (
        UniversalSegmentationLoss)
    from simpleaicv_pytorch_training_examples_tpu.universal_segmentation.segmentation_decode import (
        UniversalSegmentationDecoder)
    from simpleaicv_pytorch_training_examples_tpu.models.backbones import (
        dinov3_vit)

    # tiny dinov3 for testing: register a small factory
    def tiny_backbone(**kwargs):
        return dinov3_vit.DinoVisionTransformer(16, 64, 2, 2,
                                                ffn_layer="swiglu",
                                                **kwargs)

    from simpleaicv_pytorch_training_examples_tpu.models import backbones
    backbones.__dict__["tiny_dinov3_backbone"] = tiny_backbone

    model = UniversalSegmentation("tiny_dinov3_backbone", image_size=64,
                                  query_num=8, num_classes=6,
                                  query_block_nums=1)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    mask_preds, class_preds = model.apply(variables, x)
    assert mask_preds.shape == (2, 8, 64, 64)
    assert class_preds.shape == (2, 8, 6)

    gt_classes = np.full((2, 4), -1.0, np.float32)
    gt_classes[0, 0] = 2
    gt_classes[1, 0] = 1
    gt_classes[1, 1] = 3
    gt_masks = np.zeros((2, 4, 64, 64), np.float32)
    gt_masks[0, 0, 10:40, 10:40] = 1
    gt_masks[1, 0, 0:20, 0:20] = 1
    gt_masks[1, 1, 30:60, 30:60] = 1

    loss_fn = UniversalSegmentationLoss(num_classes=6, num_points=256)
    out = loss_fn((mask_preds, class_preds), jnp.asarray(gt_classes),
                  jnp.asarray(gt_masks), jax.random.PRNGKey(1))
    for k, v in out.items():
        assert np.isfinite(float(v)), k

    # gradients flow through matching
    def total(variables):
        mp, cp = model.apply(variables, x)
        return sum(loss_fn((mp, cp), jnp.asarray(gt_classes),
                           jnp.asarray(gt_masks),
                           jax.random.PRNGKey(1)).values())

    g = jax.grad(total)(variables)
    gnorm = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0

    seg = UniversalSegmentationDecoder(num_classes=6, mode="semantic")(
        (mask_preds, class_preds))
    assert seg.shape == (2, 64, 64)
    scores, classes, masks = UniversalSegmentationDecoder(
        num_classes=6, mode="instance")((mask_preds, class_preds))
    assert masks.shape == (2, 8, 64, 64)


def test_universal_segmentation_synthetic_overfit():
    """The query-injected DINOv3 + Hungarian point-sampled loss overfits
    a fixed 2-instance image: total loss drops to < 40% of its start in
    60 steps AND the semantic decode recovers both instance classes."""
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.engine import (
        TrainState, init_model, make_train_step)
    from simpleaicv_pytorch_training_examples_tpu.models import backbones
    from simpleaicv_pytorch_training_examples_tpu.models.backbones import (
        dinov3_vit)
    from simpleaicv_pytorch_training_examples_tpu.universal_segmentation.models import (
        UniversalSegmentation)
    from simpleaicv_pytorch_training_examples_tpu.universal_segmentation.segmentation_losses import (
        UniversalSegmentationLoss)
    from simpleaicv_pytorch_training_examples_tpu.universal_segmentation.segmentation_decode import (
        UniversalSegmentationDecoder)
    from simpleaicv_pytorch_training_examples_tpu.utils.optimizers import (
        build_optimizer)

    def tiny_backbone(**kwargs):
        return dinov3_vit.DinoVisionTransformer(16, 64, 2, 2, **kwargs)

    backbones.__dict__["tiny_dinov3_overfit_backbone"] = tiny_backbone
    model = UniversalSegmentation("tiny_dinov3_overfit_backbone",
                                  image_size=64, query_num=8,
                                  num_classes=5, query_block_nums=1)
    params, variables = init_model(model, (1, 64, 64, 3),
                                   jax.random.PRNGKey(0))

    rs = np.random.RandomState(0)
    images = rs.rand(1, 64, 64, 3).astype(np.float32)
    gt_classes = np.full((1, 4), -1.0, np.float32)
    gt_classes[0, 0] = 1
    gt_classes[0, 1] = 3
    gt_masks = np.zeros((1, 4, 64, 64), np.float32)
    gt_masks[0, 0, 4:30, 4:30] = 1
    gt_masks[0, 1, 36:60, 36:60] = 1
    batch = {"image": jnp.asarray(images),
             "gt_classes": jnp.asarray(gt_classes),
             "gt_masks": jnp.asarray(gt_masks)}
    criterion = UniversalSegmentationLoss(num_classes=5, num_points=512)

    def loss_fn(params, variables, batch, rng):
        preds, new_vars = model.apply(
            {"params": params, **variables}, batch["image"], train=True,
            mutable=list(variables.keys()),
            rngs={"dropout": rng, "droppath": rng})
        loss_dict = criterion(preds, batch["gt_classes"],
                              batch["gt_masks"], rng)
        total = sum(loss_dict.values())
        return total, (dict(new_vars), {"loss": total})

    class cfg:
        optimizer = ("AdamW", {"lr": 2e-3, "global_weight_decay": False,
                               "weight_decay": 0.0,
                               "no_weight_decay_layer_name_list": []})
        scheduler = ("CosineLR", {"warm_up_epochs": 0, "min_lr": 2e-3})
        epochs = 1

    tx, _ = build_optimizer(cfg, params, steps_per_epoch=100)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       variables=variables, opt_state=tx.init(params),
                       ema_params=None)
    step = make_train_step(model, None, tx, compute_dtype=jnp.float32,
                           loss_fn=loss_fn, donate=False)
    rng = jax.random.PRNGKey(1)
    first = None
    for i in range(60):
        state, metrics = step(state, batch, jax.random.fold_in(rng, i))
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(last)
    assert last < 0.4 * first, (first, last)

    preds = model.apply({"params": state.params, **state.variables},
                        batch["image"], train=False)
    seg = np.asarray(UniversalSegmentationDecoder(
        num_classes=5, mode="semantic")(preds))[0]
    # both synthetic instances decoded as their classes in-place
    assert (seg[10:24, 10:24] == 1).mean() > 0.8, seg[10:24, 10:24]
    assert (seg[42:56, 42:56] == 3).mean() > 0.8, seg[42:56, 42:56]
