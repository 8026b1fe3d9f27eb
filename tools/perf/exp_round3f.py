"""Round-3 batch F: pairs attention on the SERVING path (ViT eval bench
variants), incl. int8 composition."""
import sys
sys.path.insert(0, "/root/repo")
from tools.perf.lab import *  # noqa

warmup()
import jax
import jax.numpy as jnp
import numpy as np
import bench


def eval_ips(use_fused):
    from simpleaicv_pytorch_training_examples_tpu.classification import (
        backbones)
    from simpleaicv_pytorch_training_examples_tpu.engine import init_model
    model = backbones.vit_base_patch16(num_classes=1000,
                                       dtype=jnp.bfloat16,
                                       softmax_dtype=jnp.bfloat16,
                                       use_fused_attention=use_fused)
    params, variables = init_model(model, (2, 224, 224, 3),
                                   jax.random.PRNGKey(0))

    def apply_fn(params, imgs):
        return model.apply({"params": params, **variables}, imgs,
                           train=False)

    images = jnp.zeros((128, 224, 224, 3), jnp.bfloat16)
    return bench._timed_chain(apply_fn, params, images, iters=20)


print(f"eval plain: {eval_ips(False):.0f} img/s", flush=True)
print(f"eval fused: {eval_ips(True):.0f} img/s", flush=True)


def eval_int8_ips(use_fused):
    from simpleaicv_pytorch_training_examples_tpu.classification import (
        backbones)
    from simpleaicv_pytorch_training_examples_tpu.engine import init_model
    from simpleaicv_pytorch_training_examples_tpu.ops.int8 import (
        calibrate_activation_scales, int8_apply, quantize_dense_kernels)
    model = backbones.vit_base_patch16(num_classes=1000,
                                       dtype=jnp.bfloat16,
                                       softmax_dtype=jnp.bfloat16,
                                       use_fused_attention=use_fused)
    params, variables = init_model(model, (2, 224, 224, 3),
                                   jax.random.PRNGKey(0))
    images = jax.random.normal(jax.random.PRNGKey(1),
                               (128, 224, 224, 3), jnp.bfloat16)
    qtable = quantize_dense_kernels(params)
    scales = calibrate_activation_scales(
        model, {"params": params, **variables}, qtable, [(images,)],
        train=False)

    def apply_fn(qt, imgs):
        return int8_apply(model, {"params": params, **variables}, qt,
                          imgs, act_scales=scales, train=False)

    return bench._timed_chain(apply_fn, qtable, images, iters=20)


print(f"int8 fused: {eval_int8_ips(True):.0f} img/s", flush=True)
