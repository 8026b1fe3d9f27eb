"""DetEval polygon matching exactness on constructed geometry."""

import numpy as np

from simpleaicv_pytorch_training_examples_tpu.text_detection.deteval import (
    TextDetectionMetric, deteval_match)


def _rect(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], np.float32)


def test_one_to_one_exact():
    gt = [_rect(10, 10, 50, 30)]
    pred = [_rect(10, 10, 50, 30)]
    pc, gc, pn, gn = deteval_match(pred, gt, [False], (64, 64))
    assert (pc, gc, pn, gn) == (1.0, 1.0, 1.0, 1.0)


def test_miss_and_false_positive():
    gt = [_rect(10, 10, 50, 30), _rect(10, 40, 50, 60)]
    pred = [_rect(10, 10, 50, 30), _rect(55, 55, 63, 63)]  # one hit, one FP
    pc, gc, pn, gn = deteval_match(pred, gt, [False, False], (64, 64))
    assert pc == 1.0 and gc == 1.0
    assert pn == 2.0 and gn == 2.0  # FP counted, missed gt counted


def test_one_gt_split_across_two_preds():
    gt = [_rect(10, 10, 60, 30)]
    # two preds each covering one half of the gt: fully inside, so
    # pred coverage = 1.0 each; combined gt coverage = 1.0 > 0.5
    pred = [_rect(10, 10, 34, 30), _rect(36, 10, 60, 30)]
    pc, gc, pn, gn = deteval_match(pred, gt, [False], (70, 70))
    assert gc == 1.0 and pc == 2.0  # punish_factor=1.0 default
    assert pn == 2.0 and gn == 1.0


def test_ignored_gt_consumes_pred():
    gt = [_rect(10, 10, 50, 30)]
    pred = [_rect(10, 10, 50, 30)]
    pc, gc, pn, gn = deteval_match(pred, gt, [True], (64, 64))
    # matched an ignored gt: removed from both denominators
    assert (pc, gc, pn, gn) == (0.0, 0.0, 0.0, 0.0)


def test_metric_accumulation():
    m = TextDetectionMetric()
    gt = [_rect(10, 10, 50, 30)]
    m.update(gt, gt, [False], (64, 64))          # perfect image
    m.update([], [_rect(5, 5, 20, 20)], [False], (64, 64))  # missed image
    r = m.compute()
    assert r["precision"] == 100.0
    assert r["recall"] == 50.0
    assert 66.0 < r["hmean"] < 67.0


def test_rle_codec_roundtrip():
    """COCO RLE codec: random + known-vector roundtrips."""
    from simpleaicv_pytorch_training_examples_tpu.detection.rle import (
        coco_rle_to_mask, mask_to_coco_rle, rle_decode, rle_encode)

    rs = np.random.RandomState(0)
    for _ in range(10):
        m = (rs.rand(23, 31) > 0.6).astype(np.uint8)
        assert (rle_decode(rle_encode(m)) == m).all()
        r = mask_to_coco_rle(m)
        assert isinstance(r["counts"], str)
        assert (coco_rle_to_mask(r) == m).all()
    # known vector: [[0,1],[1,1]] column-major = 0,1,1,1 -> counts [1,3]
    m = np.array([[0, 1], [1, 1]], np.uint8)
    assert rle_encode(m)["counts"] == [1, 3]
