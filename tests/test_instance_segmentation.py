"""SOLOv2 + YOLACT model/loss/decode coverage (tiny shapes)."""

import numpy as np
import pytest


def _tiny_solov2():
    from simpleaicv_pytorch_training_examples_tpu.instance_segmentation.models.solov2 import (
        SOLOV2)
    return SOLOV2("resnet18", grid_nums=(8, 8, 6, 4, 4), num_classes=4,
                  mask_feature_planes=32, mask_feature_num_classes=32,
                  bbox_inter_planes=64, instance_planes=32)


def test_solov2_forward_loss_decode():
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.instance_segmentation.losses import (
        SOLOV2Loss)
    from simpleaicv_pytorch_training_examples_tpu.instance_segmentation.decode import (
        SOLOV2Decoder)

    model = _tiny_solov2()
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    mask_feat, kernel_preds, cate_preds = model.apply(variables, x)
    assert mask_feat.shape == (2, 16, 16, 32)
    assert kernel_preds[0].shape == (2, 8, 8, 32)
    assert cate_preds[0].shape == (2, 8, 8, 4)

    # gt: one instance per image
    gt_boxes = np.full((2, 4, 5), -1.0, np.float32)
    gt_boxes[0, 0] = [8, 8, 40, 40, 1]
    gt_masks = np.zeros((2, 4, 16, 16), np.float32)
    gt_masks[0, 0, 2:10, 2:10] = 1.0

    loss_fn = SOLOV2Loss(
        scale_ranges=((1, 24), (12, 48), (24, 96), (48, 192), (96, 2048)),
        grid_nums=(8, 8, 6, 4, 4), max_positive_pairs=16)
    out = loss_fn((mask_feat, kernel_preds, cate_preds),
                  jnp.asarray(gt_boxes), jnp.asarray(gt_masks))
    assert np.isfinite(float(out["cls_loss"]))
    assert np.isfinite(float(out["dice_loss"]))
    assert float(out["dice_loss"]) > 0  # a positive pair exists

    decoder = SOLOV2Decoder(grid_nums=(8, 8, 6, 4, 4), max_mask_num=8,
                            topn=32)
    scores, classes, masks = decoder((mask_feat, kernel_preds, cate_preds))
    assert scores.shape == (2, 8)
    assert masks.shape == (2, 8, 16, 16)


def test_yolact_forward_loss_decode():
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.instance_segmentation.models.yolact import (
        YOLACT)
    from simpleaicv_pytorch_training_examples_tpu.instance_segmentation.losses import (
        YOLACTLoss)
    from simpleaicv_pytorch_training_examples_tpu.instance_segmentation.decode import (
        YOLACTDecoder)

    model = YOLACT("resnet18", fpn_planes=64, proto_planes=8, num_classes=5)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    class_preds, box_preds, coef_preds, proto, seg = model.apply(variables,
                                                                 x)
    assert proto.shape == (2, 16, 16, 8)
    assert seg.shape[-1] == 4
    assert class_preds[0].shape[-1] == 5

    gt_boxes = np.full((2, 4, 5), -1.0, np.float32)
    gt_boxes[0, 0] = [0.1, 0.1, 0.6, 0.6, 1]  # normalized xyxy + class
    gt_masks = np.zeros((2, 4, 16, 16), np.float32)
    gt_masks[0, 0, 2:10, 2:10] = 1.0

    loss_fn = YOLACTLoss(resize=64, resize_type="yolo_style",
                         choose_max_mask_num=8)
    out = loss_fn((class_preds, box_preds, coef_preds, proto, seg),
                  jnp.asarray(gt_boxes), jnp.asarray(gt_masks))
    for k in ("cls_loss", "box_loss", "mask_loss", "segmantic_seg_loss"):
        assert np.isfinite(float(out[k])), k
    assert float(out["box_loss"]) > 0

    decoder = YOLACTDecoder(resize=64, resize_type="yolo_style",
                            max_object_num=8, topn=32)
    scores, classes, boxes, masks = decoder(
        (class_preds, box_preds, coef_preds, proto, seg))
    assert scores.shape == (2, 8)
    assert masks.shape == (2, 8, 16, 16)


def test_matrix_nms_suppresses_duplicates():
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.instance_segmentation.decode import (
        _matrix_nms)

    masks = np.zeros((3, 8, 8), np.float32)
    masks[0, 0:4, 0:4] = 1  # high score
    masks[1, 0:4, 0:4] = 1  # duplicate of 0
    masks[2, 4:8, 4:8] = 1  # different object
    labels = jnp.asarray([1.0, 1.0, 1.0])
    scores = jnp.asarray([0.9, 0.8, 0.7])
    decayed = np.asarray(_matrix_nms(jnp.asarray(masks), labels, scores))
    assert decayed[0] == pytest.approx(0.9, abs=1e-5)  # top stays
    assert decayed[1] < 0.2  # duplicate heavily decayed
    assert decayed[2] == pytest.approx(0.7, abs=1e-3)  # disjoint unchanged
