"""SAM2 matting coverage: image + video twins (tiny hiera, 128px) and the
trimap/alpha loss family over video-shaped preds."""

import numpy as np


_TINY = dict(image_size=128, embedding_planes=32, head_nums=1,
             block_nums=(1, 1, 2, 1), window_specification=(4, 2, 4, 2),
             global_attention_blocks=(3,), fpn_planes=32, memory_planes=16,
             memory_mask_nums=3, max_object_pointers=4)


def test_sam2_image_matting_forward():
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.models.segment_anything2_matting import (
        SAM2ImageMatting)

    model = SAM2ImageMatting(**_TINY)
    images = jnp.zeros((1, 128, 128, 3), jnp.float32)
    prompts = {"prompt_point": jnp.asarray([[[40.0, 40.0, 1.0]]]),
               "prompt_box": None, "prompt_mask": None}
    variables = model.init(jax.random.PRNGKey(0), images, prompts)
    g, l, f, ious = model.apply(variables, images, prompts)
    assert g.shape == (1, 128, 128, 3)
    assert l.shape == (1, 128, 128, 1)
    assert f.shape == (1, 128, 128, 1)
    assert ious.shape == (1, 4)
    # matting preds are probabilities
    assert float(f.min()) >= 0.0 and float(f.max()) <= 1.0


def test_sam2_video_matting_forward_and_loss():
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.models.segment_anything2_matting import (
        SAM2VideoMatting)
    from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.losses_matting import (
        SAM2MattingLoss)

    model = SAM2VideoMatting(**_TINY)
    b, t = 1, 2
    images = jnp.zeros((b, t, 128, 128, 3), jnp.float32)
    prompts = {"prompt_point": jnp.asarray([[[40.0, 40.0, 1.0]]]),
               "prompt_box": None, "prompt_mask": None}
    variables = model.init(jax.random.PRNGKey(0), images, prompts)
    g, l, f, ious, obj = model.apply(variables, images, prompts)
    assert g.shape == (b, t, 128, 128, 3)
    assert l.shape == (b, t, 128, 128, 1)
    assert f.shape == (b, t, 128, 128, 1)
    assert ious.shape == (b, t, 4)
    assert obj.shape == (b, t, 1)

    alpha = jnp.zeros((b, t, 128, 128), jnp.float32)
    alpha = alpha.at[:, :, 30:70, 30:70].set(1.0)
    trimap = jnp.zeros((b, t, 128, 128), jnp.float32)
    trimap = trimap.at[:, :, 30:70, 30:70].set(255.0)
    trimap = trimap.at[:, :, 28:30, 28:72].set(128.0)
    loss = SAM2MattingLoss()((g, l, f), alpha, trimap)
    assert "loss" in loss
    for k, v in loss.items():
        assert np.isfinite(float(v)), k


def test_sam2_video_matting_collater():
    from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.datasets.sam2_video_matting_dataset import (
        SAM2VideoMattingCollater)

    rs = np.random.RandomState(0)
    alpha = np.zeros((60, 80), np.float32)
    alpha[20:40, 30:50] = 1.0
    samples = [{
        "images": [rs.rand(60, 80, 3).astype(np.float32) * 255
                   for _ in range(2)],
        "alphas": [alpha, alpha],
    }]
    out = SAM2VideoMattingCollater(resize=64, frame_nums=2,
                                   n_points=2)(samples)
    assert out["image"].shape == (1, 2, 64, 64, 3)
    assert out["alpha"].shape == (1, 2, 64, 64)
    assert out["trimap"].shape == (1, 2, 64, 64)
    assert set(np.unique(out["trimap"])).issubset({0.0, 128.0, 255.0})
    # at least one positive point synthesized inside the object
    pts = out["prompt_point"][0]
    valid = pts[pts[:, 2] >= 0]
    assert len(valid) >= 1


def test_sam2_video_matting_condition_frame():
    """Per-frame prompts + is_cond_frame: a prompted mid-sequence
    condition frame changes its own and downstream matting outputs but
    not earlier frames (matting twin of the SAM2Video recipe)."""
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.models.segment_anything2_matting import (
        SAM2VideoMatting)

    model = SAM2VideoMatting(memory_cond_slots=2, **_TINY)
    b, t = 1, 3
    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.rand(b, t, 128, 128, 3), jnp.float32)
    rq = 128 // 4
    prompts = {
        "prompt_point": jnp.full((b, t, 2, 3), -1.0),
        "prompt_box": jnp.zeros((b, t, 4)),
        "prompt_box_valid": jnp.zeros((b, t)),
        "prompt_mask": jnp.zeros((b, t, rq, rq, 1)),
        "prompt_mask_valid": jnp.zeros((b, t)),
    }
    prompts["prompt_point"] = prompts["prompt_point"].at[:, 0, 0].set(
        jnp.asarray([40.0, 40.0, 1.0]))
    cond0 = jnp.asarray([1.0, 0.0, 0.0])

    variables = model.init(jax.random.PRNGKey(0), images, prompts,
                           is_cond_frame=cond0)
    f_a = model.apply(variables, images, prompts, is_cond_frame=cond0)[2]

    prompts_b = dict(prompts)
    prompts_b["prompt_point"] = prompts["prompt_point"].at[:, 1, 0].set(
        jnp.asarray([100.0, 100.0, 1.0]))
    cond1 = jnp.asarray([1.0, 1.0, 0.0])
    f_b = model.apply(variables, images, prompts_b, is_cond_frame=cond1)[2]

    np.testing.assert_allclose(np.asarray(f_a[:, 0]),
                               np.asarray(f_b[:, 0]), rtol=1e-5, atol=1e-5)
    assert float(jnp.abs(f_a[:, 1] - f_b[:, 1]).max()) > 1e-5
    assert float(jnp.abs(f_a[:, 2] - f_b[:, 2]).max()) > 1e-5
