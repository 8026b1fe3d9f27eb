"""SAM2 video model coverage (tiny hiera, 3 frames, 128px)."""

import numpy as np
import pytest


def test_sam2_video_forward_and_loss():
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.models.segment_anything2.sam2 import (
        SAM2Video)
    from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.losses import (
        SAM2Loss)

    model = SAM2Video(image_size=128, embedding_planes=32, head_nums=1,
                      block_nums=(1, 1, 2, 1),
                      window_specification=(4, 2, 4, 2),
                      global_attention_blocks=(3,),
                      fpn_planes=32, memory_planes=16,
                      memory_mask_nums=3, max_object_pointers=4)
    b, t = 1, 3
    images = jnp.zeros((b, t, 128, 128, 3), jnp.float32)
    prompts = {"prompt_point": jnp.asarray([[[40.0, 40.0, 1.0]]]),
               "prompt_box": None, "prompt_mask": None}
    variables = model.init(jax.random.PRNGKey(0), images, prompts)
    masks, ious, obj = model.apply(variables, images, prompts)
    assert masks.shape == (b, t, 4, 128, 128)
    assert ious.shape == (b, t, 4)
    assert obj.shape == (b, t, 1)

    targets = jnp.zeros((b, t, 128, 128), jnp.float32)
    targets = targets.at[:, :, 30:70, 30:70].set(1.0)
    loss = SAM2Loss()((masks, ious, obj), targets)
    for k, v in loss.items():
        assert np.isfinite(float(v)), k

    # gradient flows through memory attention (frame >0 path)
    def loss_fn(variables):
        m, i, o = model.apply(variables, images, prompts)
        return sum(SAM2Loss()((m, i, o), targets).values())

    g = jax.grad(loss_fn)(variables)
    mem_g = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(
        g["params"]["memory_attention"]))
    assert np.isfinite(mem_g) and mem_g > 0


def _tiny_sam2(**kw):
    from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.models.segment_anything2.sam2 import (
        SAM2Video)
    return SAM2Video(image_size=128, embedding_planes=32, head_nums=1,
                     block_nums=(1, 1, 2, 1),
                     window_specification=(4, 2, 4, 2),
                     global_attention_blocks=(3,),
                     fpn_planes=32, memory_planes=16,
                     memory_mask_nums=3, max_object_pointers=4, **kw)


def _per_frame_prompts(b, t, p=2):
    import jax.numpy as jnp
    rq = 128 // 4
    return {
        "prompt_point": jnp.full((b, t, p, 3), -1.0),
        "prompt_box": jnp.zeros((b, t, 4)),
        "prompt_box_valid": jnp.zeros((b, t)),
        "prompt_mask": jnp.zeros((b, t, rq, rq, 1)),
        "prompt_mask_valid": jnp.zeros((b, t)),
    }


def test_sam2_condition_frame_changes_downstream_masks():
    """A prompted mid-sequence condition frame must measurably change the
    downstream tracked masks (reference prepare_batch_prompt_inputs
    condition-frame semantics, sam2video_train.py:208-357)."""
    import jax
    import jax.numpy as jnp

    model = _tiny_sam2(memory_cond_slots=2)
    b, t = 1, 4
    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.rand(b, t, 128, 128, 3), jnp.float32)

    prompts = _per_frame_prompts(b, t)
    # frame 0 prompt: positive click
    prompts["prompt_point"] = prompts["prompt_point"].at[:, 0, 0].set(
        jnp.asarray([40.0, 40.0, 1.0]))
    cond0 = jnp.asarray([1.0, 0.0, 0.0, 0.0])

    variables = model.init(jax.random.PRNGKey(0), images, prompts,
                           is_cond_frame=cond0)
    masks_a, _, _ = model.apply(variables, images, prompts,
                                is_cond_frame=cond0)

    # same, plus a condition frame at t=2 with a very different click
    prompts_b = dict(prompts)
    prompts_b["prompt_point"] = prompts["prompt_point"].at[:, 2, 0].set(
        jnp.asarray([100.0, 100.0, 1.0]))
    cond2 = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    masks_b, _, _ = model.apply(variables, images, prompts_b,
                                is_cond_frame=cond2)

    # frames before the new condition frame are identical...
    np.testing.assert_allclose(np.asarray(masks_a[:, 1]),
                               np.asarray(masks_b[:, 1]), rtol=1e-5,
                               atol=1e-5)
    # ...the prompted frame and frames after it must differ
    assert float(jnp.abs(masks_a[:, 2] - masks_b[:, 2]).max()) > 1e-4
    assert float(jnp.abs(masks_a[:, 3] - masks_b[:, 3]).max()) > 1e-4


def test_sam2_point_iter_refinement_and_scan_parity():
    """Point-iteration frames refine with in-graph error clicks; the
    nn.scan path and the python-loop path must produce identical numerics
    with the full condition-frame recipe."""
    import jax
    import jax.numpy as jnp

    b, t = 1, 4
    rs = np.random.RandomState(1)
    images = jnp.asarray(rs.rand(b, t, 128, 128, 3), jnp.float32)
    gt = jnp.zeros((b, t, 128, 128)).at[:, :, 30:70, 30:70].set(1.0)

    prompts = _per_frame_prompts(b, t)
    prompts["prompt_point"] = prompts["prompt_point"].at[:, 0, 0].set(
        jnp.asarray([40.0, 40.0, 1.0]))
    cond = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    iters = jnp.asarray([0.0, 0.0, 1.0, 0.0])
    rng = jax.random.PRNGKey(7)

    loop = _tiny_sam2(use_scan=False)
    scan = _tiny_sam2(use_scan=True)
    variables = loop.init(jax.random.PRNGKey(0), images, prompts,
                          is_cond_frame=cond)

    kw = dict(gt_masks=gt, is_cond_frame=cond, is_iter_frame=iters,
              rng=rng, point_iters=2)
    m_loop, i_loop, o_loop = loop.apply(variables, images, prompts, **kw)
    m_scan, i_scan, o_scan = scan.apply(variables, images, prompts, **kw)
    np.testing.assert_allclose(np.asarray(m_loop), np.asarray(m_scan),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(i_loop), np.asarray(i_scan),
                               rtol=2e-4, atol=2e-4)

    # refinement actually changes the flagged frame vs point_iters=0
    m_plain, _, _ = loop.apply(variables, images, prompts,
                               gt_masks=gt, is_cond_frame=cond,
                               is_iter_frame=iters, rng=rng, point_iters=0)
    assert float(jnp.abs(m_loop[:, 2] - m_plain[:, 2]).max()) > 1e-4
    # non-flagged tracked frame 1 is untouched by refinement
    np.testing.assert_allclose(np.asarray(m_loop[:, 1]),
                               np.asarray(m_plain[:, 1]), rtol=1e-5,
                               atol=1e-5)


def test_video_train_tool_loss_fn_condition_recipe():
    """tools/train_video_interactive_segmentation_model.build_loss_fn must
    route a SAM2VideoBatchCollater batch (per-frame prompts + flags)
    through the condition-frame model path and produce finite grads."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp
    from tools.train_video_interactive_segmentation_model import (
        build_loss_fn)
    from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation import (
        losses)

    model = _tiny_sam2(use_scan=True, memory_cond_slots=2)

    class cfg:
        train_criterion = losses.SAM2Loss()
        use_amp = False
        decoder_point_iters = 1

    loss_fn = build_loss_fn(model, cfg)

    b, t, p = 1, 3, 2
    rs = np.random.RandomState(0)
    rq = 128 // 4
    batch = {
        "image": jnp.asarray(rs.rand(b, t, 128, 128, 3), jnp.float32),
        "mask": jnp.zeros((b, t, 128, 128)).at[:, :, 30:70, 30:70].set(1.0),
        "prompt_point": jnp.full((b, t, p, 3), -1.0).at[:, 0, 0].set(
            jnp.asarray([40.0, 40.0, 1.0])),
        "prompt_box": jnp.zeros((b, t, 4)),
        "prompt_box_valid": jnp.zeros((b, t)),
        "prompt_mask": jnp.zeros((b, t, rq, rq, 1)),
        "prompt_mask_valid": jnp.zeros((b, t)),
        "is_cond_frame": jnp.asarray([[1.0, 0.0, 0.0]]),
        "is_iter_frame": jnp.asarray([[0.0, 1.0, 0.0]]),
    }
    variables = dict(model.init(jax.random.PRNGKey(0), batch["image"],
                                {"prompt_point": batch["prompt_point"],
                                 "prompt_box": batch["prompt_box"],
                                 "prompt_box_valid":
                                     batch["prompt_box_valid"],
                                 "prompt_mask": batch["prompt_mask"],
                                 "prompt_mask_valid":
                                     batch["prompt_mask_valid"]},
                                is_cond_frame=batch["is_cond_frame"][0]))
    params = variables.pop("params")

    (loss, (_, loss_dict)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params, variables, batch,
                               jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    gsum = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gsum) and gsum > 0


def test_sam2_mask_frame_prompting():
    """Mask-as-prompt tracking (reference use_mask_as_output): the mask
    frame's outputs ARE the given mask (logits m*20-10, iou 1), memory is
    seeded from it, and subsequent tracked frames decode finitely."""
    import jax
    import jax.numpy as jnp

    model = _tiny_sam2()
    b = 1
    # 2-frame init so the tracked-frame params (pointer time projection)
    # are created alongside the mask-prompt params
    images = jnp.zeros((b, 2, 128, 128, 3), jnp.float32)
    prompts = {"prompt_point": jnp.asarray([[[40.0, 40.0, 1.0]]]),
               "prompt_box": None, "prompt_mask": None}
    variables = model.init(jax.random.PRNGKey(0), images, prompts)

    gt = jnp.zeros((b, 128, 128), jnp.float32).at[:, 30:70, 30:70].set(1.0)
    img = jnp.asarray(np.random.RandomState(0).rand(b, 128, 128, 3),
                      jnp.float32)

    def run(mdl, img, gt):
        feat, pos = mdl.encode_frame(img)
        carry = mdl._empty_carry(b)
        (masks, ious, obj), carry = mdl.add_mask_frame(feat, gt, carry)
        out2, carry = mdl.track_frame(feat, pos, carry)
        return masks, ious, carry, out2

    masks, ious, carry, out2 = model.apply(variables, img, gt, method=run)
    # outputs echo the mask as +-10 logits
    assert masks.shape == (b, 4, 128, 128)
    np.testing.assert_allclose(np.asarray(masks[0, 0]),
                               np.asarray(gt[0]) * 20.0 - 10.0)
    np.testing.assert_allclose(np.asarray(ious), 1.0)
    # memory seeded: one valid slot, pointer bank seeded
    assert float(carry["mem_valid"].sum()) >= 1.0
    assert float(carry["ptr_valid"].sum()) >= 1.0
    m2 = np.asarray(out2[0])
    assert np.isfinite(m2).all()


def test_sam2_high_res_features_decode():
    """use_high_res_features threads stride-4/8 FPN skips end-to-end
    through the video forward (scan and loop paths agree)."""
    import jax
    import jax.numpy as jnp

    b, t = 1, 2
    images = jnp.asarray(np.random.RandomState(1).rand(b, t, 128, 128, 3),
                         jnp.float32)
    prompts = {"prompt_point": jnp.asarray([[[40.0, 40.0, 1.0]]]),
               "prompt_box": None, "prompt_mask": None}
    loop = _tiny_sam2(use_high_res_features=True)
    variables = loop.init(jax.random.PRNGKey(0), images, prompts)
    assert "conv_s0" in variables["params"]["mask_decoder"]
    m1, i1, o1 = loop.apply(variables, images, prompts)
    assert m1.shape == (b, t, 4, 128, 128)

    scan = _tiny_sam2(use_high_res_features=True, use_scan=True)
    m2, i2, o2 = scan.apply(variables, images, prompts)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(i1), np.asarray(i2), atol=1e-5)


def test_split_grad_fn_matches_fused():
    """build_split_grad_fn (encoder / track / encoder-VJP, three XLA
    programs) must reproduce the fused value_and_grad(build_loss_fn)
    gradients — the compile-time fix cannot change training math."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp
    from tools.train_video_interactive_segmentation_model import (
        build_loss_fn, build_split_grad_fn)
    from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation import (
        losses)

    model = _tiny_sam2(use_scan=True, memory_cond_slots=2,
                       use_high_res_features=True)

    class cfg:
        train_criterion = losses.SAM2Loss()
        use_amp = False
        decoder_point_iters = 1

    b, t, p = 1, 3, 2
    rs = np.random.RandomState(0)
    rq = 128 // 4
    batch = {
        "image": jnp.asarray(rs.rand(b, t, 128, 128, 3), jnp.float32),
        "mask": jnp.zeros((b, t, 128, 128)).at[:, :, 30:70, 30:70].set(1.0),
        "prompt_point": jnp.full((b, t, p, 3), -1.0).at[:, 0, 0].set(
            jnp.asarray([40.0, 40.0, 1.0])),
        "prompt_box": jnp.zeros((b, t, 4)),
        "prompt_box_valid": jnp.zeros((b, t)),
        "prompt_mask": jnp.zeros((b, t, rq, rq, 1)),
        "prompt_mask_valid": jnp.zeros((b, t)),
        "is_cond_frame": jnp.asarray([[1.0, 0.0, 0.0]]),
        "is_iter_frame": jnp.asarray([[0.0, 1.0, 0.0]]),
    }
    variables = dict(model.init(jax.random.PRNGKey(0), batch["image"],
                                {k: batch[k] for k in
                                 ("prompt_point", "prompt_box",
                                  "prompt_box_valid", "prompt_mask",
                                  "prompt_mask_valid")},
                                is_cond_frame=batch["is_cond_frame"][0]))
    params = variables.pop("params")

    loss_fn = build_loss_fn(model, cfg)
    (loss, (_, fused_dict)), fused_grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params, variables, batch,
                               jax.random.PRNGKey(1))

    grad_step = build_split_grad_fn(model, cfg)
    split_dict, split_grads = grad_step(params, variables, batch,
                                        jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(split_dict["loss"]), float(loss),
                               rtol=1e-5)
    flat_f = jax.tree_util.tree_leaves_with_path(fused_grads)
    flat_s = dict(jax.tree_util.tree_leaves_with_path(split_grads))
    assert len(flat_f) == len(flat_s)
    for path, g_f in flat_f:
        g_s = flat_s[path]
        # fp32 fusion-order noise only: the split stages re-associate
        # the encoder VJP reductions (observed max 7e-6 abs on one
        # element of a conv kernel grad)
        np.testing.assert_allclose(
            np.asarray(g_s), np.asarray(g_f), rtol=5e-4, atol=2e-5,
            err_msg=jax.tree_util.keystr(path))
