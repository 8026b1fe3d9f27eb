"""DBNet / CTC / RetinaFace coverage."""

import numpy as np
import pytest


def test_dbnet_forward_and_loss():
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.text_detection import (
        losses, models)
    from simpleaicv_pytorch_training_examples_tpu.text_detection.common import (
        generate_dbnet_targets)

    model = models.resnet18_dbnet(inter_planes=64)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    preds = model.apply(variables, x)
    assert preds.shape == (1, 64, 64, 2)
    assert float(preds.min()) >= 0.0 and float(preds.max()) <= 1.0

    poly = np.array([[10, 10], [50, 10], [50, 30], [10, 30]], np.float32)
    targets = generate_dbnet_targets((64, 64), [poly], [False])
    assert targets["probability_mask"].sum() > 0
    assert targets["threshold_ignore_mask"].sum() > \
        targets["probability_mask"].sum()
    # threshold map peaks near the border, in [0.3, 0.7]
    assert 0.3 <= targets["threshold_mask"].max() <= 0.7 + 1e-6

    shapes = {k: jnp.asarray(v)[None] for k, v in targets.items()}
    out = losses.DBNetLoss()(preds, shapes)
    for k, v in out.items():
        assert np.isfinite(float(v)), k


def test_ctc_model_loss_and_converter():
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.text_recognition.models import (
        ctc_model)
    from simpleaicv_pytorch_training_examples_tpu.text_recognition.losses import (
        CTCLoss, ACELoss)
    from simpleaicv_pytorch_training_examples_tpu.text_recognition.common import (
        CTCTextLabelConverter)

    chars = list("abcdefghijklmnopqrstuvwxyz0123456789")
    converter = CTCTextLabelConverter(chars=chars, str_max_length=10)
    targets, lengths = converter.encode(["hello", "jax"])
    assert lengths.tolist() == [5, 3]
    # roundtrip through greedy decode of a one-hot sequence
    t = 12
    fake = np.full((1, t, converter.num_classes), -10.0, np.float32)
    seq = [converter.char_to_index[c] for c in "hi"]
    fake[0, 0, seq[0]] = 10
    fake[0, 1, 0] = 10  # blank
    fake[0, 2, seq[1]] = 10
    for i in range(3, t):
        fake[0, i, 0] = 10
    assert converter.decode_batch(fake) == ["hi"]

    model = ctc_model.CTCModel("resnet18", planes=32,
                               num_classes=converter.num_classes)
    x = jnp.zeros((2, 32, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    preds = model.apply(variables, x)
    assert preds.shape == (2, 4, converter.num_classes)  # W/32 = 4

    # CTC needs T >= label length; use the real 10-slot targets
    targets2, lengths2 = converter.encode(["ab", "c"])
    loss = CTCLoss(blank_index=0)(preds, jnp.asarray(targets2),
                                  jnp.asarray(lengths2))
    assert np.isfinite(float(loss))
    ace = ACELoss(blank_index=0)(preds, jnp.asarray(targets2),
                                 jnp.asarray(lengths2))
    assert np.isfinite(float(ace))


def test_retinaface_forward_loss_decode():
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.face_detection import (
        decode, losses, models)

    model = models.resnet18_retinaface(planes=64)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    cls_heads, box_heads = model.apply(variables, x)
    assert cls_heads[0].shape == (1, 16, 16, 3, 1)
    assert box_heads[0].shape == (1, 16, 16, 3, 4)

    annots = np.full((1, 4, 5), -1.0, np.float32)
    annots[0, 0] = [20, 20, 60, 60, 0]
    loss_fn = losses.RetinaFaceLoss(box_loss_type="CIoU")
    out = loss_fn((cls_heads, box_heads), jnp.asarray(annots))
    assert np.isfinite(float(out["cls_loss"]))
    assert np.isfinite(float(out["reg_loss"]))
    assert float(out["reg_loss"]) > 0

    decoder = decode.RetinaFaceDecoder(max_object_num=10,
                                       min_score_threshold=0.0)
    scores, classes, boxes = decoder((cls_heads, box_heads))
    assert scores.shape == (1, 10)
    assert boxes.shape == (1, 10, 4)
