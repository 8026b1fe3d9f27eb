"""Synthetic-overfit end-to-end tests beyond classification (VERDICT
round-1 item 9): a tiny detector and a tiny SAM must drive their losses
down on a fixed synthetic batch through the REAL train step (engine
make_train_step with optimizer/EMA/NaN-skip machinery), and a ragged
final eval batch must shard over the 8-device mesh via
pad_batch_to_multiple."""

import numpy as np
import pytest


def _make_train_bits(model, loss_fn, params, variables, lr=1e-3):
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.engine import (
        TrainState, make_train_step)
    from simpleaicv_pytorch_training_examples_tpu.utils.optimizers import (
        build_optimizer)

    class cfg:
        optimizer = ("AdamW", {"lr": lr, "global_weight_decay": False,
                               "weight_decay": 0.0,
                               "no_weight_decay_layer_name_list": []})
        scheduler = ("CosineLR", {"warm_up_epochs": 0, "min_lr": lr})
        epochs = 1

    tx, _ = build_optimizer(cfg, params, steps_per_epoch=100)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       variables=variables, opt_state=tx.init(params),
                       ema_params=None)
    step = make_train_step(model, None, tx, compute_dtype=jnp.float32,
                           loss_fn=loss_fn, donate=False)
    return state, step


def test_detection_synthetic_overfit():
    """RetinaNet (resnet18, 160^2) overfits one synthetic box batch: the
    summed retina loss drops to < 40% of its start within 40 steps."""
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.detection import losses
    from simpleaicv_pytorch_training_examples_tpu.detection.models.retinanet import (
        resnet18_retinanet)
    from simpleaicv_pytorch_training_examples_tpu.engine import init_model

    model = resnet18_retinanet(num_classes=4)
    params, variables = init_model(model, (1, 160, 160, 3),
                                   jax.random.PRNGKey(0))
    criterion = losses.RetinaLoss(
        areas=[[32, 32], [64, 64], [128, 128], [256, 256], [512, 512]],
        ratios=[0.5, 1, 2],
        scales=[2**0, 2**(1.0 / 3.0), 2**(2.0 / 3.0)],
        strides=[8, 16, 32, 64, 128])

    rs = np.random.RandomState(0)
    images = rs.rand(2, 160, 160, 3).astype(np.float32)
    # one box per image, padded annots to 8 with -1
    annots = np.full((2, 8, 5), -1.0, np.float32)
    annots[0, 0] = [20, 20, 90, 90, 1]
    annots[1, 0] = [40, 60, 140, 130, 2]
    batch = {"image": jnp.asarray(images), "annots": jnp.asarray(annots)}

    def loss_fn(params, variables, batch, rng):
        preds, new_vars = model.apply(
            {"params": params, **variables}, batch["image"], train=True,
            mutable=list(variables.keys()))
        loss_dict = criterion(preds, batch["annots"])
        total = sum(loss_dict.values())
        return total, (dict(new_vars), {"loss": total, **loss_dict})

    state, step = _make_train_bits(model, loss_fn, params, variables,
                                   lr=5e-4)
    rng = jax.random.PRNGKey(1)
    first = None
    for i in range(40):
        state, metrics = step(state, batch, rng)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(last)
    assert last < 0.4 * first, (first, last)


def test_sam_synthetic_overfit():
    """A tiny SAM overfits a synthetic disc from a point prompt: SAMLoss
    drops to < 60% of its start within 30 steps (the iou-prediction MSE
    term floors the total; mask terms keep falling)."""
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.engine import init_model
    from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation import (
        losses)
    from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation.models.segment_anything.sam import (
        SAM)

    model = SAM(image_size=128, image_encoder_embedding_planes=64,
                image_encoder_block_nums=2, image_encoder_head_nums=2,
                image_encoder_global_attn_indexes=(1,),
                prompt_encoder_embedding_planes=64)
    b = 2
    gt = np.zeros((b, 1, 128, 128), np.float32)
    gt[:, :, 40:90, 40:90] = 1.0
    images = np.random.RandomState(0).rand(b, 128, 128, 3).astype(
        np.float32)
    prompts = {
        "prompt_point": jnp.asarray(
            np.tile(np.asarray([[[64.0, 64.0, 1.0]]], np.float32),
                    (b, 1, 1))),
        "prompt_box": jnp.zeros((b, 4)),
        "prompt_box_valid": jnp.zeros((b,)),
        "prompt_mask": jnp.zeros((b, 32, 32, 1)),
        "prompt_mask_valid": jnp.zeros((b,)),
    }
    batch = {"image": jnp.asarray(images), "mask": jnp.asarray(gt)}
    criterion = losses.SAMLoss()

    variables_all = model.init({"params": jax.random.PRNGKey(0)},
                               jnp.asarray(images), prompts)
    variables_all = dict(variables_all)
    params = variables_all.pop("params")

    def loss_fn(p, variables, batch, rng):
        masks, ious = model.apply({"params": p, **variables},
                                  batch["image"], prompts)
        loss_dict = criterion(([masks], [ious]), batch["mask"])
        total = sum(loss_dict.values())
        return total, (variables, {"loss": total})

    state, step = _make_train_bits(model, loss_fn, params, variables_all,
                                   lr=1e-3)
    rng = jax.random.PRNGKey(1)
    first = None
    for i in range(30):
        state, metrics = step(state, batch, rng)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(last)
    assert last < 0.6 * first, (first, last)


def test_ctc_synthetic_overfit_and_decode():
    """A tiny CTC recognizer overfits two fixed synthetic text lines: the
    CTC loss drops to < 20% of its start within 60 steps AND the greedy
    decode reproduces the target strings exactly (loss + converter + model
    round-trip, reference text_scripts.py train/test loop contract)."""
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.engine import init_model
    from simpleaicv_pytorch_training_examples_tpu.text_recognition import (
        losses)
    from simpleaicv_pytorch_training_examples_tpu.text_recognition.common import (
        CTCTextLabelConverter)
    from simpleaicv_pytorch_training_examples_tpu.text_recognition.models.ctc_model import (
        resnet18_ctc_model)

    chars = list("abcdefghij0123456789")
    converter = CTCTextLabelConverter(chars=chars, str_max_length=8)
    model = resnet18_ctc_model(planes=64,
                               num_classes=converter.num_classes)
    params, variables = init_model(model, (1, 32, 192, 3),
                                   jax.random.PRNGKey(0))

    rs = np.random.RandomState(0)
    # stride-32 backbone -> 192/32 = 6 CTC frames >= longest target
    images = rs.rand(2, 32, 192, 3).astype(np.float32)
    texts = ["abc19", "fgh"]
    targets, lengths = converter.encode(texts)
    batch = {"image": jnp.asarray(images),
             "target": jnp.asarray(targets),
             "target_length": jnp.asarray(lengths)}
    criterion = losses.CTCLoss(blank_index=converter.blank_index)

    def loss_fn(params, variables, batch, rng):
        preds, new_vars = model.apply(
            {"params": params, **variables}, batch["image"], train=True,
            mutable=list(variables.keys()))
        loss = criterion(preds, batch["target"], batch["target_length"])
        return loss, (dict(new_vars), {"loss": loss})

    state, step = _make_train_bits(model, loss_fn, params, variables,
                                   lr=2e-3)
    rng = jax.random.PRNGKey(1)
    first = None
    for _ in range(60):
        state, metrics = step(state, batch, rng)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(last)
    assert last < 0.2 * first, (first, last)

    preds = model.apply({"params": state.params, **state.variables},
                        batch["image"], train=False)
    decoded = converter.decode_batch(np.asarray(preds))
    assert decoded == texts, decoded


def test_ragged_eval_batch_shards_on_mesh():
    """drop_last=False leaves a ragged final eval batch; it must pad to the
    device count, shard over the 8-device mesh, run the jitted eval step,
    and unpad to exact per-sample results (VERDICT weak #8)."""
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.classification import (
        backbones)
    from simpleaicv_pytorch_training_examples_tpu.engine import (
        TrainState, init_model, make_classification_eval_step)
    from simpleaicv_pytorch_training_examples_tpu.parallel import (
        build_mesh, shard_batch)
    from simpleaicv_pytorch_training_examples_tpu.parallel.mesh import (
        pad_batch_to_multiple)

    mesh = build_mesh()
    n_dev = mesh.devices.size
    assert n_dev == 8

    model = backbones.resnet18cifar(num_classes=10)
    params, variables = init_model(model, (1, 32, 32, 3),
                                   jax.random.PRNGKey(0))
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       variables=variables, opt_state=(), ema_params=None)
    eval_step = make_classification_eval_step(model,
                                              compute_dtype=jnp.float32)

    # ragged: 11 samples on an 8-device mesh
    rs = np.random.RandomState(0)
    batch = {"image": rs.rand(11, 32, 32, 3).astype(np.float32),
             "label": rs.randint(0, 10, 11)}
    padded, n_real = pad_batch_to_multiple(batch, n_dev)
    assert n_real == 11 and padded["image"].shape[0] == 16
    sharded = shard_batch(padded, mesh)
    top1, topk, logits = eval_step(state, sharded)
    assert np.asarray(top1).shape[0] == 16
    real_logits = np.asarray(logits)[:n_real]
    assert np.isfinite(real_logits).all()

    # the padded rows must not change the real rows' results
    exact = model.apply({"params": params, **variables},
                        jnp.asarray(batch["image"]), train=False)
    np.testing.assert_allclose(real_logits, np.asarray(exact), rtol=2e-4,
                               atol=2e-4)


def test_semantic_seg_synthetic_overfit():
    """PFAN semantic segmentation (resnet18, 64^2, 5 classes) overfits a
    fixed synthetic label map: CE+dice loss drops to < 30% of its start
    within 40 steps."""
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.engine import init_model
    from simpleaicv_pytorch_training_examples_tpu.semantic_segmentation import (
        losses, models)

    model = models.resnet18_pfan_semantic_segmentation(num_classes=5)
    params, variables = init_model(model, (1, 64, 64, 3),
                                   jax.random.PRNGKey(0))
    ce = losses.CELoss()
    dice = losses.DiceLoss()

    rs = np.random.RandomState(0)
    images = rs.rand(2, 64, 64, 3).astype(np.float32)
    labels = np.zeros((2, 64, 64), np.int32)
    labels[:, 10:40, 10:40] = 1
    labels[:, 45:60, 5:30] = 3
    batch = {"image": jnp.asarray(images), "label": jnp.asarray(labels)}

    def loss_fn(params, variables, batch, rng):
        preds, new_vars = model.apply(
            {"params": params, **variables}, batch["image"], train=True,
            mutable=list(variables.keys()))
        loss = ce(preds, batch["label"]) + dice(preds, batch["label"])
        return loss, (dict(new_vars), {"loss": loss})

    state, step = _make_train_bits(model, loss_fn, params, variables,
                                   lr=2e-3)
    rng = jax.random.PRNGKey(1)
    first = None
    for _ in range(80):
        state, metrics = step(state, batch, rng)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(last)
    assert last < 0.25 * first, (first, last)
    # the overfit net segments the synthetic map mostly correctly
    preds = model.apply({"params": state.params, **state.variables},
                        batch["image"], train=False)
    pred_labels = np.asarray(jnp.argmax(preds, axis=-1))
    acc = (pred_labels == labels).mean()
    assert acc > 0.9, acc


def test_dbnet_synthetic_overfit():
    """DBNet (resnet18, 128^2) overfits a synthetic text region: the
    summed probability/threshold/binary losses drop to < 35% of their
    start within 40 steps."""
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.engine import init_model
    from simpleaicv_pytorch_training_examples_tpu.text_detection import (
        losses, models)

    model = models.resnet18_dbnet()
    params, variables = init_model(model, (1, 128, 128, 3),
                                   jax.random.PRNGKey(0))
    criterion = losses.DBNetLoss()

    rs = np.random.RandomState(0)
    images = rs.rand(2, 128, 128, 3).astype(np.float32)
    prob_mask = np.zeros((2, 128, 128), np.float32)
    prob_mask[:, 40:60, 20:100] = 1.0  # a shrunk text kernel
    thresh_mask = np.zeros((2, 128, 128), np.float32)
    thresh_mask[:, 35:65, 15:105] = 0.5  # border band target
    shapes = {
        "probability_mask": jnp.asarray(prob_mask),
        "probability_ignore_mask": jnp.ones((2, 128, 128)),
        "threshold_mask": jnp.asarray(thresh_mask),
        "threshold_ignore_mask": jnp.ones((2, 128, 128)),
    }
    batch = {"image": jnp.asarray(images), "shapes": shapes}

    def loss_fn(params, variables, batch, rng):
        preds, new_vars = model.apply(
            {"params": params, **variables}, batch["image"], train=True,
            mutable=list(variables.keys()))
        loss_dict = criterion(preds, batch["shapes"])
        total = sum(loss_dict.values())
        return total, (dict(new_vars), {"loss": total})

    state, step = _make_train_bits(model, loss_fn, params, variables,
                                   lr=2e-3)
    rng = jax.random.PRNGKey(1)
    first = None
    for _ in range(80):
        state, metrics = step(state, batch, rng)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(last)
    assert last < 0.35 * first, (first, last)
