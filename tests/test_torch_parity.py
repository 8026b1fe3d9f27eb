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
