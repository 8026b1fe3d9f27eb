"""The 6 universal-segmentation test entries' shared evaluators, driven
end-to-end with a tiny model and synthetic batches."""

import os
import sys

import numpy as np

sys.path.append(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))


class _Ctx:
    def __init__(self, mesh, loader, n_devices):
        self.mesh = mesh
        self.test_loader = loader
        self.n_devices = n_devices
        self.logger = None


def _setup():
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.engine import (
        TrainState, init_model)
    from simpleaicv_pytorch_training_examples_tpu.models import backbones
    from simpleaicv_pytorch_training_examples_tpu.models.backbones import (
        dinov3_vit)
    from simpleaicv_pytorch_training_examples_tpu.parallel.mesh import (
        build_mesh)
    from simpleaicv_pytorch_training_examples_tpu.universal_segmentation.models import (
        UniversalSegmentation)

    def tiny_backbone(**kwargs):
        return dinov3_vit.DinoVisionTransformer(16, 64, 2, 2,
                                                ffn_layer="swiglu",
                                                **kwargs)

    backbones.__dict__["tiny_dinov3_backbone_eval"] = tiny_backbone
    model = UniversalSegmentation(
        "tiny_dinov3_backbone_eval", image_size=64, query_num=8,
        num_classes=6, query_block_nums=1)
    params, variables = init_model(model, (2, 64, 64, 3),
                                   jax.random.PRNGKey(0))

    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       variables=variables, opt_state=(), ema_params=None)
    mesh = build_mesh(data_parallel_size=2, devices=jax.devices()[:2])
    return model, state, mesh


def test_semantic_and_binary_eval():
    import universal_segmentation_test_common as u

    model, state, mesh = _setup()
    rs = np.random.RandomState(0)
    sem_batch = {"image": rs.rand(2, 64, 64, 3).astype(np.float32),
                 "mask": rs.randint(0, 5, (2, 64, 64)).astype(np.float32)}

    class cfg:
        num_classes = 6
        use_amp = False

    ctx = _Ctx(mesh, [sem_batch], 2)
    miou, msg = u.semantic_eval(model, cfg, ctx)(state)
    assert np.isfinite(miou) and "mIoU" in msg

    bin_batch = {"image": rs.rand(2, 64, 64, 3).astype(np.float32),
                 "mask": (rs.rand(2, 64, 64) > 0.5).astype(np.float32)}
    ctx = _Ctx(mesh, [bin_batch], 2)
    miou, msg = u.binary_eval(model, cfg, ctx, matting=True)(state)
    assert np.isfinite(miou) and "SAD" in msg


def test_instance_eval():
    import universal_segmentation_test_common as u

    model, state, mesh = _setup()
    rs = np.random.RandomState(1)
    gt_classes = np.full((2, 4), -1.0, np.float32)
    gt_classes[0, 0] = 1
    gt_masks = np.zeros((2, 4, 64, 64), np.float32)
    gt_masks[0, 0, 10:30, 10:30] = 1.0
    batch = {"image": rs.rand(2, 64, 64, 3).astype(np.float32),
             "gt_classes": gt_classes, "gt_masks": gt_masks}

    class cfg:
        num_classes = 6
        use_amp = False
        decoder = None

    ctx = _Ctx(mesh, [batch], 2)
    mAP, msg = u.instance_eval(model, cfg, ctx)(state)
    assert np.isfinite(mAP) and "mAP" in msg
