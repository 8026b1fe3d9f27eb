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
