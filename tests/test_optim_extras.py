"""Muon optimizer, schedules, VOC/WIDERFace evaluators, anchor kmeans,
text metrics, FLOPs counting."""

import numpy as np
import pytest


def test_muon_optimizer_end_to_end():
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.classification import (
        backbones, losses)
    from simpleaicv_pytorch_training_examples_tpu.engine import (
        TrainState, init_model, make_train_step)
    from simpleaicv_pytorch_training_examples_tpu.utils.optimizers import (
        build_optimizer)

    model = backbones.resnet18cifar(num_classes=10)
    params, variables = init_model(model, (2, 32, 32, 3),
                                   jax.random.PRNGKey(0))

    class cfg:
        optimizer = ("Muon", {"lr": 0.02, "weight_decay": 0.01,
                              "momentum": 0.95})
        scheduler = ("CosineLR", {"warm_up_epochs": 0, "min_lr": 0.0})
        epochs = 10

    tx, report = build_optimizer(cfg, params, steps_per_epoch=5)
    # muon/adamw split reported
    assert {g["optimizer"] for g in report} == {"Muon", "AdamW"}
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       variables=variables, opt_state=tx.init(params),
                       ema_params=None)
    step = make_train_step(model, losses.CELoss(), tx,
                           compute_dtype=jnp.float32, donate=False)
    rs = np.random.RandomState(0)
    batch = {"image": rs.randn(8, 32, 32, 3).astype(np.float32),
             "label": rs.randint(0, 10, 8).astype(np.int32)}
    losses_seen = []
    for i in range(5):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses_seen.append(float(metrics["loss"]))
        assert np.isfinite(losses_seen[-1])
    assert losses_seen[-1] < losses_seen[0]


def test_newton_schulz_orthogonalizes():
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.utils.muon import (
        newton_schulz5)

    rs = np.random.RandomState(0)
    g = jnp.asarray(rs.randn(64, 32).astype(np.float32))
    x = newton_schulz5(g, steps=5)
    # columns approximately orthonormal-ish: singular values in [0.3, 1.7]
    s = np.linalg.svd(np.asarray(x, np.float32), compute_uv=False)
    assert s.max() < 1.8 and s.min() > 0.2


def test_voc_eval_perfect():
    from simpleaicv_pytorch_training_examples_tpu.detection.voc_eval import (
        evaluate_voc_detection)

    rs = np.random.RandomState(0)
    gts, dets = [], []
    for _ in range(4):
        boxes = []
        for _ in range(3):
            x, y = rs.uniform(0, 300, 2)
            w, h = rs.uniform(40, 100, 2)
            boxes.append([x, y, x + w, y + h, rs.randint(0, 5)])
        g = np.asarray(boxes, np.float32)
        gts.append(g)
        dets.append((g[:, :4], np.full(len(g), 0.9), g[:, 4]))
    mAP, aps = evaluate_voc_detection(gts, dets, num_classes=5)
    assert mAP == pytest.approx(1.0, abs=1e-6)


def test_widerface_eval_perfect():
    from simpleaicv_pytorch_training_examples_tpu.face_detection.widerface_eval import (
        evaluate_widerface)

    rs = np.random.RandomState(0)
    gts, dets = [], []
    for _ in range(4):
        boxes = []
        for _ in range(3):
            x, y = rs.uniform(0, 300, 2)
            w, h = rs.uniform(20, 80, 2)
            boxes.append([x, y, x + w, y + h])
        b = np.asarray(boxes, np.float32)
        gts.append({"boxes": b, "easy": np.ones(3, bool),
                    "medium": np.ones(3, bool), "hard": np.ones(3, bool)})
        dets.append((b, rs.uniform(0.5, 1.0, 3).astype(np.float32)))
    easy, medium, hard = evaluate_widerface(gts, dets, thresh_num=100)
    assert easy > 0.95 and hard > 0.95


def test_anchor_kmeans():
    from simpleaicv_pytorch_training_examples_tpu.detection.yolov3_anchor_cluster import (
        kmeans_anchors)

    rs = np.random.RandomState(0)
    # three obvious clusters
    whs = np.concatenate([
        rs.normal(32, 2, (100, 2)), rs.normal(128, 5, (100, 2)),
        rs.normal(400, 10, (100, 2))
    ]).astype(np.float32)
    centers, mean_iou = kmeans_anchors(whs, n_anchors=3)
    assert mean_iou > 0.8
    areas = centers[:, 0] * centers[:, 1]
    assert (np.diff(areas) > 0).all()  # sorted


def test_text_metrics():
    from simpleaicv_pytorch_training_examples_tpu.utils.text_metrics import (
        edit_distance, lcs_precision_recall)

    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance("", "abc") == 3
    p, r = lcs_precision_recall("abcdef", "abdf")
    assert p == pytest.approx(4 / 6)
    assert r == pytest.approx(1.0)


def test_category_lcs_meter():
    """Per-category LCS PR with reference semantics (global char counts,
    category filtering, garbage-char conversion, ignore threshold —
    /root/reference/tools/text_scripts.py:512-893)."""
    from simpleaicv_pytorch_training_examples_tpu.utils.text_metrics import (
        CategoryLCSMeter)

    meter = CategoryLCSMeter(
        categories={"num": "0123456789", "alpha": "abcdefghij"},
        keep_chars=set("abcdefghij0123456789"))
    # pred "ab12", gt "ab1x" -> x becomes garbage; all-LCS=3 p=3/4 r=3/4;
    # num: pred "12" gt "1" -> c=1 p=2 t=1; alpha: "ab" vs "ab" -> 2/2/2
    meter.update("ab12", "ab1x")
    # spaces stripped, empty gt rows skipped entirely
    meter.update("zz", " ")
    pr = meter.results(ignore_threshold=0)
    assert pr["all"][0] == pytest.approx(3 / 4 * 100)
    assert pr["all"][1] == pytest.approx(3 / 4 * 100)
    assert pr["num"][0] == pytest.approx(1 / 2 * 100)
    assert pr["num"][1] == pytest.approx(100.0)
    assert pr["alpha"] == (pytest.approx(100.0), pytest.approx(100.0))
    # below-threshold categories report -1 (not a misleading 0/100)
    pr = meter.results(ignore_threshold=1000)
    assert pr["num"] == (-1.0, -1.0)


def test_default_category_tables_ship():
    from simpleaicv_pytorch_training_examples_tpu.text_recognition import (
        char_sets)

    tables = char_sets.default_category_tables()
    assert len(tables["num"]) == 10
    assert len(tables["alpha"]) == 52
    assert len(tables["chinese_l1"]) == 3500
    assert len(tables["chinese_l2"]) == 3000
    assert len(tables["chinese_l3"]) == 1605
    # GB table chars are CJK, disjoint from ascii
    assert not (set(tables["chinese_l1"]) & set(tables["alpha"]))


def test_flops_counting():
    import jax
    from simpleaicv_pytorch_training_examples_tpu.classification import (
        backbones)
    from simpleaicv_pytorch_training_examples_tpu.engine import init_model
    from simpleaicv_pytorch_training_examples_tpu.utils.flops import (
        compute_flops_and_params)

    model = backbones.resnet18cifar(num_classes=10)
    params, variables = init_model(model, (1, 32, 32, 3),
                                   jax.random.PRNGKey(0))
    flops, n_params = compute_flops_and_params(model, params, variables,
                                               (1, 32, 32, 3), train=False)
    assert n_params > 11e6
    # resnet18 @32px forward ~ 0.5 GFLOPs either side
    assert 1e8 < flops < 5e9


def test_profiler_trace_and_time_step(tmp_path):
    """utils/profiler.py: the trace context writes an XPlane capture and
    time_step returns a sane per-call latency for a jitted fn."""
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.utils.profiler import (
        time_step, trace)

    @jax.jit
    def step(x):
        return (x @ x.T).sum()

    x = jnp.ones((64, 64))
    with trace(str(tmp_path)):
        float(step(x))
    traced = list(tmp_path.rglob("*"))
    assert any(p.is_file() for p in traced), traced

    dt = time_step(step, x, iters=3, warmup=1)
    assert 0 < dt < 5.0
