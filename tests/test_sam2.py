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
