"""SAM matting + universal matting model coverage (tiny variants)."""

import numpy as np
import pytest


def test_sam_matting_forward():
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation.models.segment_anything_matting import (
        SAMMatting)

    model = SAMMatting(image_size=128, patch_size=16,
                       image_encoder_embedding_planes=64,
                       image_encoder_block_nums=2,
                       image_encoder_head_nums=2,
                       image_encoder_global_attn_indexes=(1,),
                       prompt_encoder_embedding_planes=32)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    prompts = {"prompt_point": jnp.asarray([[[40.0, 40.0, 1.0]]]),
               "prompt_box": None, "prompt_mask": None}
    variables = model.init(jax.random.PRNGKey(0), x, prompts)
    g, l, f, ious = model.apply(variables, x, prompts)
    assert g.shape == (1, 128, 128, 3)
    assert l.shape == (1, 128, 128, 1)
    assert f.shape == (1, 128, 128, 1)
    assert ious.shape == (1, 4)
    assert float(g.min()) >= 0.0 and float(g.max()) <= 1.0

    # matting losses accept the outputs
    from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation.losses_matting import (
        GlobalTrimapCELoss, FusionAlphaLoss)
    trimap = jnp.zeros((1, 128, 128), jnp.float32)
    alpha = jnp.zeros((1, 128, 128), jnp.float32)
    assert np.isfinite(float(GlobalTrimapCELoss()(g, trimap)))
    assert np.isfinite(float(FusionAlphaLoss()(f, alpha)))


def test_universal_matting_forward():
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.models import backbones
    from simpleaicv_pytorch_training_examples_tpu.models.backbones import (
        dinov3_vit)
    from simpleaicv_pytorch_training_examples_tpu.universal_segmentation.models import (
        UniversalMatting)

    def tiny_backbone(**kwargs):
        return dinov3_vit.DinoVisionTransformer(16, 64, 2, 2, **kwargs)

    backbones.__dict__["tiny_dinov3_backbone2"] = tiny_backbone
    model = UniversalMatting("tiny_dinov3_backbone2", image_size=64,
                             query_num=4, num_classes=2,
                             query_block_nums=1)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    g, l, f, cls = model.apply(variables, x)
    assert g.shape == (1, 4, 64, 64, 3)
    assert l.shape == (1, 4, 64, 64, 1)
    assert f.shape == (1, 4, 64, 64, 1)
    assert cls.shape == (1, 4, 2)


def test_grad_conn_metrics():
    """Gradient/Connectivity matting metrics: zero for identical maps,
    positive for perturbed ones, connectivity penalizes disconnection."""
    from simpleaicv_pytorch_training_examples_tpu.human_matting.metrics import (
        connectivity_error, gradient_error)

    rs = np.random.RandomState(0)
    gt = np.zeros((64, 64), np.float32)
    gt[16:48, 16:48] = 1.0
    assert gradient_error(gt, gt) == 0.0
    assert connectivity_error(gt, gt) == 0.0

    blurred = gt.copy()
    blurred[16:48, 14:16] = 0.5  # soft edge
    assert gradient_error(blurred, gt) > 0

    disconnected = gt.copy()
    disconnected[30:34, :] = 0.0  # split the object in two
    assert connectivity_error(disconnected, gt) > 0
