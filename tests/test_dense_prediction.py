"""PFAN semantic seg / SOD / matting coverage."""

import numpy as np
import pytest


def test_pfan_semantic_forward_and_losses():
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.semantic_segmentation import (
        losses, models)

    model = models.resnet18_pfan_semantic_segmentation(num_classes=7)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    pred = model.apply(variables, x)
    assert pred.shape == (1, 64, 64, 7)

    label = jnp.zeros((1, 64, 64), jnp.int32)
    for loss_cls in (losses.CELoss, losses.MultiClassBCELoss):
        v = float(loss_cls()(pred, label))
        assert np.isfinite(v)
    for lt in ("softmax", "sigmoid"):
        assert np.isfinite(float(losses.IoULoss(lt)(pred, label)))
        assert np.isfinite(float(losses.DiceLoss(lt)(pred, label)))


def test_pfan_sod_forward_and_losses():
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.salient_object_detection import (
        losses, models)

    model = models.resnet18_pfan_segmentation()
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    pred = model.apply(variables, x)
    assert pred.shape == (1, 64, 64, 1)
    assert float(pred.min()) >= 0.0 and float(pred.max()) <= 1.0

    label = (np.random.RandomState(0).rand(1, 64, 64) > 0.7).astype(
        np.float32)
    label = jnp.asarray(label)
    for loss in (losses.BCELoss(), losses.OHEMBCELoss(),
                 losses.BCEIouloss(), losses.BCEDiceLoss()):
        assert np.isfinite(float(loss(pred, label)))

    # perfect prediction -> near-zero iou/dice loss
    perfect = label[..., None]
    assert float(losses.BCEIouloss()(perfect, label)) < 0.01


def test_ohem_matches_naive_topk():
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.salient_object_detection.losses import (
        OHEMBCELoss)

    rs = np.random.RandomState(0)
    pred = rs.uniform(0.01, 0.99, (1, 8, 8, 1)).astype(np.float32)
    label = (rs.rand(1, 8, 8) > 0.5).astype(np.float32)
    got = float(OHEMBCELoss(1.5)(jnp.asarray(pred), jnp.asarray(label)))

    # naive numpy reference
    p = np.clip(pred.reshape(-1), 1e-4, 1 - 1e-4)
    l = label.reshape(-1)
    pos = l > 0
    n_pos = int(pos.sum())
    n_neg = min(int((~pos).sum()), int(n_pos * 1.5))
    loss = -(l * np.log(p) + (1 - l) * np.log(1 - p))
    pos_sum = loss[pos].sum()
    neg_sum = np.sort(loss[~pos])[::-1][:n_neg].sum()
    want = (pos_sum + neg_sum) / (n_pos + n_neg + 1e-4)
    assert got == pytest.approx(want, rel=1e-4)


def test_pfan_matting_forward_and_losses():
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.human_matting import (
        losses, models)

    model = models.resnet18_pfan_matting()
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    global_pred, local_pred, fused_pred = model.apply(variables, x)
    assert global_pred.shape == (1, 64, 64, 3)
    assert local_pred.shape == (1, 64, 64, 1)
    assert fused_pred.shape == (1, 64, 64, 1)

    rs = np.random.RandomState(0)
    trimap = jnp.asarray(
        rs.choice([0, 128, 255], (1, 64, 64)).astype(np.float32))
    alpha = jnp.asarray(rs.rand(1, 64, 64).astype(np.float32))
    image = jnp.asarray(rs.rand(1, 64, 64, 3).astype(np.float32))

    assert np.isfinite(float(losses.GlobalTrimapCELoss()(global_pred,
                                                         trimap)))
    assert np.isfinite(float(losses.GloabelTrimapIouLoss()(global_pred,
                                                           trimap)))
    assert np.isfinite(float(losses.LocalAlphaLoss()(local_pred, alpha,
                                                     trimap)))
    assert np.isfinite(float(losses.LocalLaplacianLoss()(local_pred, alpha,
                                                         trimap)))
    assert np.isfinite(float(losses.FusionAlphaLoss()(fused_pred, alpha)))
    assert np.isfinite(float(losses.FusionLaplacianLoss()(fused_pred,
                                                          alpha)))
    assert np.isfinite(float(losses.CompositionLoss()(image, alpha, image,
                                                      image, fused_pred)))


def test_collaborative_matting_logic():
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.models.pfan import (
        PFANMatting)

    # global says: pixel0 bg, pixel1 transition, pixel2 fg
    g = np.zeros((1, 1, 3, 3), np.float32)
    g[0, 0, 0] = [0.9, 0.05, 0.05]
    g[0, 0, 1] = [0.05, 0.9, 0.05]
    g[0, 0, 2] = [0.05, 0.05, 0.9]
    local = np.full((1, 1, 3, 1), 0.5, np.float32)
    fused = PFANMatting.collaborative_matting(jnp.asarray(g),
                                              jnp.asarray(local))
    np.testing.assert_allclose(np.asarray(fused)[0, 0, :, 0],
                               [0.0, 0.5, 1.0])
