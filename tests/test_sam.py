"""SAM encoder/prompt/decoder/loss coverage (tiny 128px SAM)."""

import numpy as np
import pytest


def _tiny_sam():
    from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation.models.segment_anything.sam import (
        SAM)
    return SAM(image_size=128, patch_size=16,
               image_encoder_embedding_planes=64,
               image_encoder_block_nums=2, image_encoder_head_nums=2,
               image_encoder_global_attn_indexes=(1,),
               prompt_encoder_embedding_planes=32)


def test_sam_forward_and_loss():
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation.losses import (
        SAMLoss)

    model = _tiny_sam()
    x = jnp.zeros((2, 128, 128, 3), jnp.float32)
    prompts = {
        "prompt_point": jnp.asarray(
            np.array([[[40, 40, 1], [-1, -1, -1]],
                      [[80, 60, 1], [20, 20, 0]]], np.float32)),
        "prompt_box": None,
        "prompt_mask": None,
    }
    variables = model.init(jax.random.PRNGKey(0), x, prompts)
    masks, ious = model.apply(variables, x, prompts)
    assert masks.shape == (2, 4, 128, 128)
    assert ious.shape == (2, 4)

    targets = jnp.zeros((2, 1, 128, 128), jnp.float32)
    targets = targets.at[:, :, 30:70, 30:70].set(1.0)
    loss = SAMLoss()(([masks, masks], [ious, ious]), targets)
    for k, v in loss.items():
        assert np.isfinite(float(v)), k
    assert float(loss["focal_loss"]) > 0

    # box + mask prompts (fixed-shape path with validity flags)
    prompts2 = {
        "prompt_point": prompts["prompt_point"],
        "prompt_box": jnp.asarray(np.array([[10, 10, 90, 90],
                                            [0, 0, 0, 0]], np.float32)),
        "prompt_box_valid": jnp.asarray([1.0, 0.0]),
        "prompt_mask": jnp.zeros((2, 32, 32, 1), jnp.float32),
        "prompt_mask_valid": jnp.asarray([1.0, 0.0]),
    }
    masks2, ious2 = model.apply(variables, x, prompts2)
    assert masks2.shape == (2, 4, 128, 128)

    # gradient flows through encoder + decoder
    def loss_fn(variables):
        m, i = model.apply(variables, x, prompts)
        return sum(SAMLoss()(([m], [i]), targets).values())

    g = jax.grad(loss_fn)(variables)
    gnorm = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g["params"]))
    assert np.isfinite(gnorm) and gnorm > 0


def test_sam_split_forward_matches_joint():
    import jax
    import jax.numpy as jnp

    model = _tiny_sam()
    x = jnp.ones((1, 128, 128, 3), jnp.float32) * 0.3
    prompts = {"prompt_point": jnp.asarray([[[30.0, 30.0, 1.0]]]),
               "prompt_box": None, "prompt_mask": None}
    variables = model.init(jax.random.PRNGKey(0), x, prompts)

    m1, i1 = model.apply(variables, x, prompts)
    emb = model.apply(variables, x, method="forward_image_encoder")
    m2, i2 = model.apply(variables, emb, prompts,
                         method="forward_prompt_encoder_mask_decoder")
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-5)


def test_automatic_mask_generator_runs():
    """AMG over a tiny SAM: grid-prompt decode, iou/stability filtering
    and box-NMS produce a coherent mask list on a random-init model with
    permissive thresholds (reference sam_predict_everything flow)."""
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation.automatic_mask_generator import (
        SAMAutomaticMaskGenerator)
    from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation.models.segment_anything.sam import (
        SAM)

    model = SAM(image_size=128, image_encoder_embedding_planes=64,
                image_encoder_block_nums=2, image_encoder_head_nums=2,
                image_encoder_global_attn_indexes=(1,),
                prompt_encoder_embedding_planes=64)
    b_prompts = {
        "prompt_point": jnp.asarray([[[40.0, 40.0, 1.0]]]),
        "prompt_box": jnp.zeros((1, 4)),
        "prompt_box_valid": jnp.zeros((1,)),
        "prompt_mask": jnp.zeros((1, 32, 32, 1)),
        "prompt_mask_valid": jnp.zeros((1,)),
    }
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 128, 128, 3)), b_prompts)
    amg = SAMAutomaticMaskGenerator(
        model, variables, points_per_side=4, points_per_batch=8,
        pred_iou_thresh=-1e9, stability_score_thresh=-1e9,
        nms_iou_thresh=0.9, min_mask_area=-1)
    image = np.random.RandomState(0).rand(128, 128, 3).astype(np.float32)
    out = amg.generate(image)
    assert len(out) >= 1
    m0 = out[0]
    assert set(m0) == {"mask", "predicted_iou", "stability_score", "bbox",
                       "area"}
    assert m0["mask"].shape == (128, 128)
    assert m0["area"] == int(m0["mask"].sum())
    # NMS keeps boxes below the overlap threshold pairwise-distinct
    assert len(out) <= 16


def test_remat_policy_parity():
    """`remat_policy="dots_saveable"` changes only what the backward
    recomputes, never the numerics: loss and gradients match the default
    full-recompute remat exactly (tiny SAM, fp32)."""
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation.models.segment_anything.sam import (
        SAM)
    from simpleaicv_pytorch_training_examples_tpu.ops.remat import (
        named_remat_policy)

    kw = dict(image_size=128, patch_size=16,
              image_encoder_embedding_planes=64,
              image_encoder_block_nums=2, image_encoder_head_nums=2,
              image_encoder_global_attn_indexes=(1,),
              prompt_encoder_embedding_planes=32,
              use_gradient_checkpoint=True)
    base = SAM(**kw)
    dots = SAM(**kw, remat_policy="dots_saveable")

    x = jnp.asarray(
        np.random.RandomState(0).rand(1, 128, 128, 3), jnp.float32)
    prompts = {"prompt_point": jnp.asarray([[[40.0, 40.0, 1.0]]]),
               "prompt_box": None, "prompt_mask": None}
    variables = base.init(jax.random.PRNGKey(0), x, prompts)

    def loss(model, v):
        m, i = model.apply(v, x, prompts)
        return (m ** 2).mean() + (i ** 2).mean()

    l0, g0 = jax.value_and_grad(lambda v: loss(base, v))(variables)
    l1, g1 = jax.value_and_grad(lambda v: loss(dots, v))(variables)
    assert float(l0) == float(l1)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=2e-7)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown remat policy"):
        named_remat_policy("bogus")
