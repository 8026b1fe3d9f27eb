"""DETR model + Hungarian loss + decoder coverage."""

import numpy as np
import pytest


def test_detr_forward_and_loss_and_decode():
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.detection import models
    from simpleaicv_pytorch_training_examples_tpu.detection.losses import (
        DETRLoss)
    from simpleaicv_pytorch_training_examples_tpu.detection.decode import (
        DETRDecoder)

    model = models.resnet18_detr(num_classes=5, query_nums=10,
                                 encoder_layer_nums=2, decoder_layer_nums=2)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    masks = jnp.zeros((2, 64, 64), bool)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, masks)
    cls_out, reg_out = model.apply(variables, x, masks)
    assert cls_out.shape == (2, 2, 10, 6)
    assert reg_out.shape == (2, 2, 10, 4)
    assert float(reg_out.min()) >= 0.0 and float(reg_out.max()) <= 1.0

    annots = np.full((2, 4, 5), -1.0, np.float32)
    annots[0, 0] = [0.5, 0.5, 0.2, 0.3, 2]  # cxcywh normalized + class
    annots[0, 1] = [0.2, 0.3, 0.1, 0.1, 0]
    loss_fn = DETRLoss(num_classes=5)
    loss_dict = loss_fn([cls_out, reg_out], jnp.asarray(annots))
    assert len(loss_dict) == 2 * 3
    for k, v in loss_dict.items():
        assert np.isfinite(float(v)), k

    # loss must be differentiable end to end
    def total_loss(variables):
        c, r = model.apply(variables, x, masks)
        return sum(loss_fn([c, r], jnp.asarray(annots)).values())

    g = jax.grad(lambda v: total_loss(v))(variables)
    gnorm = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0

    decoder = DETRDecoder(num_classes=5, max_object_num=10,
                          min_score_threshold=0.0)
    sizes = np.array([[64, 64], [64, 64]], np.float32)
    scores, classes, boxes = decoder([cls_out, reg_out], sizes)
    assert scores.shape == (2, 10)
    assert boxes.shape == (2, 10, 4)


def test_hungarian_matching_optimal():
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.detection.losses import (
        _hungarian_match_host)

    # cost clearly favors (q0->g1, q1->g0)
    cost = np.array([[[5.0, 1.0, 99.0], [1.0, 5.0, 99.0]]], np.float32)
    valid = np.array([[True, True, False]])
    out = _hungarian_match_host(cost, valid)
    np.testing.assert_array_equal(out[0], [1, 0])

    # no valid gts -> all -1
    out2 = _hungarian_match_host(cost, np.zeros_like(valid))
    assert (out2 == -1).all()
