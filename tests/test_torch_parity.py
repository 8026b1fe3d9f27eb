"""Numerical parity vs the reference torch models (skipped when the
reference mount is absent). Verifies the torch->flax weight converter and
the architectural fidelity of the flax backbones in one shot: same weights
-> same logits."""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference mount not available")


def test_resnet18_logit_parity_with_reference():
    import torch
    sys.path.insert(0, REFERENCE)
    from SimpleAICV.classification.backbones.resnet import resnet18 as \
        torch_resnet18

    torch.manual_seed(0)
    tmodel = torch_resnet18(num_classes=10)
    tmodel.eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.classification import (
        backbones)
    from simpleaicv_pytorch_training_examples_tpu.engine import init_model
    from simpleaicv_pytorch_training_examples_tpu.utils.torch_convert import (
        convert_resnet_state_dict, merge_converted)

    model = backbones.resnet18(num_classes=10)
    params, variables = init_model(model, (1, 64, 64, 3),
                                   jax.random.PRNGKey(0))
    p_flat, s_flat = convert_resnet_state_dict(sd)
    params, batch_stats = merge_converted(params, variables["batch_stats"],
                                          p_flat, s_flat)

    rs = np.random.RandomState(0)
    x = rs.randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(
            x.transpose(0, 3, 1, 2))).numpy()
    j_out = np.asarray(model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(x), train=False))
    np.testing.assert_allclose(j_out, t_out, atol=2e-3, rtol=1e-3)


def test_vit_logit_parity_with_reference():
    import torch
    sys.path.insert(0, REFERENCE)
    from SimpleAICV.classification.backbones.vit import _vit as torch_vit

    torch.manual_seed(0)
    tmodel = torch_vit(16, 64, 2, 2, 4, image_size=64, num_classes=7)
    tmodel.eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.models.backbones.vit import (
        ViT)
    from simpleaicv_pytorch_training_examples_tpu.engine import init_model
    from simpleaicv_pytorch_training_examples_tpu.utils.torch_convert import (
        convert_vit_state_dict, merge_converted)

    model = ViT(16, 64, 2, 2, 4, image_size=64, num_classes=7)
    params, variables = init_model(model, (1, 64, 64, 3),
                                   jax.random.PRNGKey(0))
    p_flat, _ = convert_vit_state_dict(sd)
    params, _ = merge_converted(params, None, p_flat, {})

    rs = np.random.RandomState(0)
    x = rs.randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(
            x.transpose(0, 3, 1, 2))).numpy()
    j_out = np.asarray(model.apply({"params": params, **variables},
                                   jnp.asarray(x), train=False))
    np.testing.assert_allclose(j_out, t_out, atol=2e-3, rtol=1e-3)


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference repo not mounted")
def test_van_logits_match_reference():
    import sys
    sys.path.insert(0, "/root/reference")
    import torch
    import jax
    import jax.numpy as jnp
    from SimpleAICV.classification.backbones.van import van_b0 as torch_van
    from simpleaicv_pytorch_training_examples_tpu.engine import init_model
    from simpleaicv_pytorch_training_examples_tpu.models.backbones.van import (
        van_b0)
    from simpleaicv_pytorch_training_examples_tpu.utils.torch_convert import (
        convert_van_state_dict, merge_converted)

    tnet = torch_van(num_classes=7).eval()
    pf, sf = convert_van_state_dict(tnet.state_dict())
    jnet = van_b0(num_classes=7)
    params, variables = init_model(jnet, (1, 64, 64, 3),
                                   jax.random.PRNGKey(0))
    params, bstats = merge_converted(params, variables["batch_stats"],
                                     pf, sf)
    x = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        t_out = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    j_out = np.asarray(jnet.apply(
        {"params": params, "batch_stats": bstats}, jnp.asarray(x),
        train=False))
    np.testing.assert_allclose(t_out, j_out, atol=2e-5)


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference repo not mounted")
def test_convformer_logits_match_reference():
    import sys
    sys.path.insert(0, "/root/reference")
    import torch
    import jax
    import jax.numpy as jnp
    from SimpleAICV.classification.backbones.convformer import (
        convformer_s18 as torch_cf)
    from simpleaicv_pytorch_training_examples_tpu.engine import init_model
    from simpleaicv_pytorch_training_examples_tpu.models.backbones.convformer import (
        convformer_s18)
    from simpleaicv_pytorch_training_examples_tpu.utils.torch_convert import (
        convert_convformer_state_dict, merge_converted)

    tnet = torch_cf(num_classes=7).eval()
    pf, sf = convert_convformer_state_dict(tnet.state_dict())
    jnet = convformer_s18(num_classes=7)
    params, variables = init_model(jnet, (1, 64, 64, 3),
                                   jax.random.PRNGKey(0))
    params, bstats = merge_converted(params, variables["batch_stats"],
                                     pf, sf)
    x = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        t_out = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    j_out = np.asarray(jnet.apply(
        {"params": params, "batch_stats": bstats}, jnp.asarray(x),
        train=False))
    np.testing.assert_allclose(t_out, j_out, atol=2e-5)


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference repo not mounted")
def test_sam_encoder_matches_reference():
    import sys
    sys.path.insert(0, "/root/reference")
    import torch
    import jax
    import jax.numpy as jnp
    from SimpleAICV.interactive_segmentation.models.segment_anything.image_encoder import (
        ViTImageEncoder as TorchEnc)
    from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation.models.segment_anything.image_encoder import (
        ViTImageEncoder as JaxEnc)
    from simpleaicv_pytorch_training_examples_tpu.utils.torch_convert import (
        convert_sam_encoder_state_dict, merge_converted)

    kw = dict(image_size=256, patch_size=16, embedding_planes=96,
              block_nums=2, head_nums=2, out_planes=64)
    tnet = TorchEnc(window_size=14, global_attn_indexes=(1,), **kw).eval()
    pf, _ = convert_sam_encoder_state_dict(tnet.state_dict())
    jnet = JaxEnc(window_size=14, global_attn_indexes=(1,), **kw)
    v = jnet.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))
    params, _ = merge_converted(v["params"], {}, pf, {})
    x = np.random.RandomState(0).rand(1, 256, 256, 3).astype(np.float32)
    with torch.no_grad():
        t_out = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    j_out = np.asarray(jnet.apply({"params": params}, jnp.asarray(x)))
    if t_out.shape != j_out.shape and t_out.ndim == 4:
        t_out = t_out.transpose(0, 2, 3, 1)
    np.testing.assert_allclose(t_out, j_out, atol=5e-5)


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference repo not mounted")
def test_sam2_hiera_encoder_matches_reference():
    import sys
    sys.path.insert(0, "/root/reference")
    import torch
    import jax
    import jax.numpy as jnp
    from SimpleAICV.video_interactive_segmentation.models.segment_anything2.image_encoder import (
        ImageEncoder as TorchEnc)
    from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.models.segment_anything2.image_encoder import (
        ImageEncoder as JaxEnc)
    from simpleaicv_pytorch_training_examples_tpu.utils.torch_convert import (
        convert_sam2_encoder_state_dict, merge_converted)

    kw = dict(embedding_planes=32, head_nums=1, block_nums=(1, 1, 2, 1),
              window_specification=(4, 2, 4, 2),
              global_attention_blocks=(3,), fpn_planes=32)
    tnet = TorchEnc(**kw).eval()
    pf, _ = convert_sam2_encoder_state_dict(tnet.state_dict())
    jnet = JaxEnc(**kw)
    v = jnet.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    params, _ = merge_converted(v["params"], {}, pf, {})
    x = np.random.RandomState(0).rand(1, 128, 128, 3).astype(np.float32)
    with torch.no_grad():
        t_feats = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        t_out = t_feats[0][-1].numpy() if isinstance(t_feats, tuple) \
            else t_feats[-1].numpy()
    j_feats, _ = jnet.apply({"params": params}, jnp.asarray(x))
    j_out = np.asarray(j_feats[-1])
    if t_out.ndim == 4 and t_out.shape != j_out.shape:
        t_out = t_out.transpose(0, 2, 3, 1)
    np.testing.assert_allclose(t_out, j_out, atol=2e-5)
