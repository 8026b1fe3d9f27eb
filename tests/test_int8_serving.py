"""Int8 serving path (ops/int8.py): quantization table construction and
the interceptor-driven int8 Dense forward must closely track the fp
forward (on-chip throughput numbers live in the module docstring)."""

import numpy as np


def test_int8_dense_matches_fp():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from simpleaicv_pytorch_training_examples_tpu.ops.int8 import (
        int8_apply, quantize_dense_kernels)

    class MLP(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(256, name="fc1")(x)
            x = nn.relu(x)
            x = nn.Dense(128, name="fc2")(x)
            return nn.Dense(8, name="head")(x)  # excluded (tiny)

    model = MLP()
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(16, 128), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    qtable = quantize_dense_kernels(variables["params"])
    # head has 8 outputs < min_features -> stays fp
    assert ("fc1",) in qtable and ("fc2",) in qtable
    assert ("head",) not in qtable
    wq, ws = qtable[("fc1",)]
    assert wq.dtype == jnp.int8 and ws.shape == (256,)

    fp = model.apply(variables, x)
    q8 = int8_apply(model, variables, qtable, x)
    rel = float(jnp.abs(fp - q8).max() / (jnp.abs(fp).max() + 1e-9))
    assert rel < 0.05, rel
    corr = np.corrcoef(np.asarray(fp).ravel(), np.asarray(q8).ravel())[0, 1]
    assert corr > 0.999, corr


def test_int8_static_scales_match_dynamic():
    """Calibrated static per-tensor activation scales (the fast serving
    mode) must track the fp forward about as well as dynamic per-token."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from simpleaicv_pytorch_training_examples_tpu.ops.int8 import (
        calibrate_activation_scales, int8_apply, quantize_dense_kernels)

    class MLP(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(256, name="fc1")(x)
            x = nn.gelu(x)
            return nn.Dense(128, name="fc2")(x)

    model = MLP()
    rs = np.random.RandomState(1)
    calib = [jnp.asarray(rs.randn(16, 128), jnp.float32) for _ in range(3)]
    x = jnp.asarray(rs.randn(16, 128), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    qtable = quantize_dense_kernels(variables["params"])
    scales = calibrate_activation_scales(model, variables, qtable, calib)
    assert set(scales) == set(qtable)
    assert all(s > 0 for s in scales.values())

    fp = model.apply(variables, x)
    q8 = int8_apply(model, variables, qtable, x, act_scales=scales)
    corr = np.corrcoef(np.asarray(fp).ravel(), np.asarray(q8).ravel())[0, 1]
    assert corr > 0.995, corr


def test_int8_vit_logits_track_fp():
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.classification import (
        backbones)
    from simpleaicv_pytorch_training_examples_tpu.engine import init_model
    from simpleaicv_pytorch_training_examples_tpu.ops.int8 import (
        int8_apply, quantize_dense_kernels)

    from simpleaicv_pytorch_training_examples_tpu.models.backbones.vit import (
        ViT)
    model = ViT(16, 64, 2, 2, 4, image_size=64, num_classes=10)
    params, variables = init_model(model, (1, 64, 64, 3),
                                   jax.random.PRNGKey(0))
    qtable = quantize_dense_kernels(params, min_features=32)
    assert len(qtable) > 0

    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.rand(4, 64, 64, 3), jnp.float32)
    fp = model.apply({"params": params, **variables}, images, train=False)
    q8 = int8_apply(model, {"params": params, **variables}, qtable,
                    images, train=False)
    corr = np.corrcoef(np.asarray(fp).ravel(), np.asarray(q8).ravel())[0, 1]
    assert corr > 0.99, corr


def test_int8_conv_matches_fp():
    """Conv path of the interceptor (VERDICT r2 next #9): per-channel
    int8 conv must track fp through stride/padding variants, and tiny or
    grouped convs must stay fp."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from simpleaicv_pytorch_training_examples_tpu.ops.int8 import (
        calibrate_activation_scales, int8_apply, quantize_conv_kernels)

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(64, (3, 3), name="stem")(x)  # cin 3 -> stays fp
            x = nn.relu(x)
            x = nn.Conv(128, (3, 3), strides=(2, 2), name="c1")(x)
            x = nn.relu(x)
            x = nn.Conv(128, (1, 1), padding="VALID", name="c2")(x)
            return x

    model = Net()
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(2, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    qtable = quantize_conv_kernels(variables["params"])
    assert ("stem",) not in qtable          # cin=3 < min_features
    assert ("c1",) in qtable and ("c2",) in qtable
    wq, ws = qtable[("c1",)]
    assert wq.dtype == jnp.int8 and ws.shape == (128,)

    fp = model.apply(variables, x)
    q8 = int8_apply(model, variables, qtable, x)
    corr = np.corrcoef(np.asarray(fp).ravel(), np.asarray(q8).ravel())[0, 1]
    assert corr > 0.999, corr

    # static calibrated scales work for convs too
    scales = calibrate_activation_scales(model, variables, qtable, [(x,)])
    assert set(scales) == set(qtable)
    q8s = int8_apply(model, variables, qtable, x, act_scales=scales)
    corr_s = np.corrcoef(np.asarray(fp).ravel(),
                         np.asarray(q8s).ravel())[0, 1]
    assert corr_s > 0.995, corr_s


def test_int8_retinanet_heads_track_fp():
    """The full conv-heavy detector through the int8 interceptor: every
    FPN/head/backbone conv >=64ch quantized, cls/reg outputs still
    correlate with fp (the bench asserts the same on-chip)."""
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.detection.models.retinanet import (
        resnet18_retinanet)
    from simpleaicv_pytorch_training_examples_tpu.engine import init_model
    from simpleaicv_pytorch_training_examples_tpu.ops.int8 import (
        int8_apply, quantize_conv_kernels)

    model = resnet18_retinanet(num_classes=20)
    params, variables = init_model(model, (1, 128, 128, 3),
                                   jax.random.PRNGKey(0))
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.rand(1, 128, 128, 3), jnp.float32)

    qtable = quantize_conv_kernels(params)
    assert len(qtable) > 20, len(qtable)

    fp_cls, fp_reg = model.apply({"params": params, **variables}, x,
                                 train=False)
    q_cls, q_reg = int8_apply(model, {"params": params, **variables},
                              qtable, x, train=False)
    fp_all = np.concatenate([np.asarray(h).ravel() for h in fp_cls])
    q_all = np.concatenate([np.asarray(h).ravel() for h in q_cls])
    corr = np.corrcoef(fp_all, q_all)[0, 1]
    assert corr > 0.99, corr
    fp_r = np.concatenate([np.asarray(h).ravel() for h in fp_reg])
    q_r = np.concatenate([np.asarray(h).ravel() for h in q_reg])
    corr_r = np.corrcoef(fp_r, q_r)[0, 1]
    assert corr_r > 0.98, corr_r


def test_int8_sam_encoder_embeddings_track_fp():
    """int8 Dense serving through `method="forward_image_encoder"` on a
    tiny SAM: calibrated static scales, embeddings correlate with fp
    (the SAM encode-once predictor serving path)."""
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation.models.segment_anything.sam import (
        SAM)
    from simpleaicv_pytorch_training_examples_tpu.ops.int8 import (
        calibrate_activation_scales, int8_apply, quantize_dense_kernels)

    model = SAM(image_size=128, patch_size=16,
                image_encoder_embedding_planes=64,
                image_encoder_block_nums=2, image_encoder_head_nums=2,
                image_encoder_global_attn_indexes=(1,),
                prompt_encoder_embedding_planes=32)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(1, 128, 128, 3), jnp.float32)
    prompts = {"prompt_point": jnp.asarray([[[40.0, 40.0, 1.0]]]),
               "prompt_box": None, "prompt_mask": None}
    variables = model.init(jax.random.PRNGKey(0), x, prompts)

    qtable = quantize_dense_kernels(variables["params"])
    assert len(qtable) >= 8, len(qtable)
    act = calibrate_activation_scales(model, variables, qtable, [(x,)],
                                      method="forward_image_encoder")
    fp = model.apply(variables, x, method="forward_image_encoder")
    q8 = int8_apply(model, variables, qtable, x,
                    method="forward_image_encoder", act_scales=act)
    corr = np.corrcoef(np.asarray(fp, np.float32).ravel(),
                       np.asarray(q8, np.float32).ravel())[0, 1]
    assert corr > 0.99, corr
