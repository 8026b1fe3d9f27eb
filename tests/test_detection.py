"""Detection stack coverage: models, losses, decode, NMS parity, COCO eval."""

import numpy as np
import pytest


def _fake_preds_retina(b=2, sizes=((32, 32), (16, 16), (8, 8), (4, 4),
                                   (2, 2)), num_classes=10):
    import jax.numpy as jnp
    rs = np.random.RandomState(0)
    cls_heads = [jnp.asarray(
        rs.uniform(0.01, 0.99, (b, h, w, 9, num_classes)).astype(np.float32))
        for h, w in sizes]
    reg_heads = [jnp.asarray(
        rs.randn(b, h, w, 9, 4).astype(np.float32) * 0.1) for h, w in sizes]
    return [cls_heads, reg_heads]


def test_retina_loss_runs_and_perfect_pred_low_loss():
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.detection.losses import (
        RetinaLoss)

    loss_fn = RetinaLoss(box_loss_type="SmoothL1")
    preds = _fake_preds_retina()
    annots = np.full((2, 8, 5), -1.0, np.float32)
    annots[0, 0] = [30, 30, 80, 80, 2]
    annots[0, 1] = [100, 120, 200, 230, 5]
    annots[1, 0] = [50, 60, 150, 170, 1]
    out = loss_fn(preds, jnp.asarray(annots))
    assert np.isfinite(float(out["cls_loss"]))
    assert np.isfinite(float(out["reg_loss"]))

    # empty-annotation batch: zero losses, no NaN
    empty = np.full((2, 8, 5), -1.0, np.float32)
    out2 = loss_fn(preds, jnp.asarray(empty))
    assert float(out2["reg_loss"]) == 0.0


def test_fcos_loss_runs():
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.detection.losses import (
        FCOSLoss)

    b = 2
    sizes = ((32, 32), (16, 16), (8, 8), (4, 4), (2, 2))
    rs = np.random.RandomState(0)
    cls_heads = [jnp.asarray(rs.uniform(0.01, 0.99,
                                        (b, h, w, 10)).astype(np.float32))
                 for h, w in sizes]
    reg_heads = [jnp.asarray(rs.randn(b, h, w, 4).astype(np.float32) * 0.1)
                 for h, w in sizes]
    cnt_heads = [jnp.asarray(rs.uniform(0.01, 0.99,
                                        (b, h, w, 1)).astype(np.float32))
                 for h, w in sizes]
    annots = np.full((b, 8, 5), -1.0, np.float32)
    annots[0, 0] = [30, 30, 90, 90, 2]
    annots[1, 0] = [10, 10, 250, 250, 7]
    loss_fn = FCOSLoss()
    out = loss_fn([cls_heads, reg_heads, cnt_heads], jnp.asarray(annots))
    for k in ("cls_loss", "reg_loss", "center_ness_loss"):
        assert np.isfinite(float(out[k])), k

    # a point inside the [30,90] box at stride-8 level must be positive:
    # indirectly checked via reg loss > 0
    assert float(out["reg_loss"]) > 0.0


def test_device_nms_matches_python_nms():
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.ops.nms import (
        device_nms, python_nms)

    rs = np.random.RandomState(1)
    n = 60
    ctrs = rs.uniform(50, 400, (n, 2))
    whs = rs.uniform(20, 120, (n, 2))
    boxes = np.concatenate([ctrs - whs / 2, ctrs + whs / 2],
                           axis=1).astype(np.float32)
    scores = rs.uniform(0.1, 1.0, n).astype(np.float32)
    order = np.argsort(-scores)
    sboxes, sscores = boxes[order], scores[order]

    keep_ref = python_nms(sboxes, sscores, 0.5)
    out_scores, out_idx = device_nms(jnp.asarray(sboxes),
                                     jnp.asarray(sscores), 0.5, n)
    out_idx = np.asarray(out_idx)
    kept_dev = out_idx[out_idx >= 0]
    np.testing.assert_array_equal(np.sort(kept_dev), np.sort(keep_ref))


def test_retina_decoder_recovers_box():
    """Feed a synthetic prediction where one anchor confidently predicts a
    known box; the decoder must return it."""
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.detection.decode import (
        RetinaDecoder)
    from simpleaicv_pytorch_training_examples_tpu.detection.models.anchor import (
        RetinaAnchors)

    sizes = ((32, 32), (16, 16), (8, 8), (4, 4), (2, 2))
    num_classes = 10
    cls_heads = [np.full((1, h, w, 9, num_classes), 0.01, np.float32)
                 for h, w in sizes]
    reg_heads = [np.zeros((1, h, w, 9, 4), np.float32) for h, w in sizes]
    # pick anchor (level 0, y=4, x=4, a=0); zero reg offset -> box == anchor
    cls_heads[0][0, 4, 4, 0, 3] = 0.95
    anchors = RetinaAnchors()(list(sizes))
    expect = anchors[0][4, 4, 0]

    decoder = RetinaDecoder(min_score_threshold=0.3, nms_threshold=0.5)
    scores, classes, boxes = decoder([
        [jnp.asarray(c) for c in cls_heads],
        [jnp.asarray(r) for r in reg_heads]])
    assert scores[0, 0] == pytest.approx(0.95, abs=1e-3)
    assert classes[0, 0] == 3
    np.testing.assert_allclose(boxes[0, 0], np.trunc(expect), atol=1.0)
    # remaining slots empty
    assert classes[0, 1] == -1


def test_coco_eval_perfect_predictions():
    from simpleaicv_pytorch_training_examples_tpu.detection.coco_eval import (
        COCOMeanAveragePrecision)

    gts, dets = [], []
    rs = np.random.RandomState(0)
    for img in range(4):
        for j in range(3):
            box = [float(rs.uniform(0, 300)), float(rs.uniform(0, 300)),
                   float(rs.uniform(40, 100)), float(rs.uniform(40, 100))]
            cat = int(rs.randint(1, 4))
            gts.append({"image_id": img, "category_id": cat, "bbox": box,
                        "iscrowd": 0, "area": box[2] * box[3]})
            dets.append({"image_id": img, "category_id": cat, "bbox": box,
                         "score": 0.9})
    evaluator = COCOMeanAveragePrecision()
    stats = evaluator.evaluate(gts, dets)
    assert stats[0] == pytest.approx(1.0, abs=1e-6)
    assert stats[1] == pytest.approx(1.0, abs=1e-6)

    # half the detections shifted far away -> mAP ~0.5ish
    bad_dets = []
    for i, d in enumerate(dets):
        d = dict(d)
        if i % 2 == 0:
            d["bbox"] = [d["bbox"][0] + 500, d["bbox"][1] + 500,
                         d["bbox"][2], d["bbox"][3]]
        bad_dets.append(d)
    stats2 = evaluator.evaluate(gts, bad_dets)
    assert 0.2 < stats2[0] < 0.8


def test_retinanet_fcos_forward_shapes():
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.detection import models

    model = models.resnet18_retinanet(num_classes=10)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    cls_heads, reg_heads = model.apply(variables, x)
    assert len(cls_heads) == 5
    assert cls_heads[0].shape == (1, 16, 16, 9, 10)
    assert reg_heads[0].shape == (1, 16, 16, 9, 4)

    fcos = models.resnet18_fcos(num_classes=10)
    variables = fcos.init(jax.random.PRNGKey(0), x)
    cls_heads, reg_heads, cnt_heads = fcos.apply(variables, x)
    assert cls_heads[0].shape == (1, 16, 16, 10)
    assert reg_heads[0].shape == (1, 16, 16, 4)
    assert cnt_heads[0].shape == (1, 16, 16, 1)


def test_coco_ap_pinned_interpolation_value():
    """Pin the 101-point-interpolated COCO AP on a hand-computable case:
    one class, 4 GT boxes, detections ranked [TP, FP, TP, miss...].

    With 2 TPs over 4 GTs at ranks 1 and 3: precision-recall points are
    (r=0.25, p=1.0) and (r=0.50, p=2/3). 101-pt interpolation gives
    p=1.0 for r in [0, .25], p=2/3 for r in (.25, .50], 0 beyond ->
    AP = (26*1.0 + 25*2/3 + 50*0) / 101 = 0.42244 (matches
    pycocotools on the same input).
    """
    from simpleaicv_pytorch_training_examples_tpu.detection.coco_eval import (
        COCOMeanAveragePrecision)

    def gt(img, x):
        return {"image_id": img, "category_id": 1,
                "bbox": [x, 10.0, 50.0, 50.0], "iscrowd": 0,
                "area": 2500.0}

    def det(img, x, score):
        return {"image_id": img, "category_id": 1,
                "bbox": [x, 10.0, 50.0, 50.0], "score": score}

    gts = [gt(0, 10), gt(0, 200), gt(1, 10), gt(1, 200)]
    dets = [
        det(0, 10, 0.9),     # rank 1: TP (exact match)
        det(0, 400, 0.8),    # rank 2: FP (no gt there)
        det(1, 200, 0.7),    # rank 3: TP
    ]
    stats = COCOMeanAveragePrecision().evaluate(gts, dets)
    expected = (26 * 1.0 + 25 * (2.0 / 3.0)) / 101
    # stats[1] is AP@.50; exact-overlap TPs make every IoU threshold
    # agree, so AP@[.5:.95] (stats[0]) must equal it too
    assert stats[1] == pytest.approx(expected, abs=1e-6), stats[1]
    assert stats[0] == pytest.approx(expected, abs=1e-6), stats[0]
