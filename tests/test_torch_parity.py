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


@pytest.fixture(scope="module")
def sam2_pair():
    """Tiny reference torch SAM2Video + our flax SAM2Video with the FULL
    converted state dict (convert_sam2_state_dict) merged in."""
    sys.path.insert(0, REFERENCE)
    import torch
    import jax
    import jax.numpy as jnp
    from SimpleAICV.video_interactive_segmentation.models.segment_anything2.sam2video_train import (
        _sam2video)
    from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.models.segment_anything2.sam2 import (
        SAM2Video)
    from simpleaicv_pytorch_training_examples_tpu.utils.torch_convert import (
        convert_sam2_state_dict, merge_converted)

    torch.manual_seed(0)
    tnet = _sam2video(
        image_size=128, patch_size=16, image_encoder_embedding_planes=32,
        image_encoder_head_nums=1, image_encoder_block_nums=[1, 2, 2, 1],
        image_encoder_window_position_embedding_bkg_spatial_size=[7, 7],
        image_encoder_window_specification=[4, 2, 7, 2],
        image_encoder_global_attention_blocks=[3],
        prompt_encoder_embedding_planes=256).eval()

    jnet = SAM2Video(image_size=128, embedding_planes=32, head_nums=1,
                     block_nums=(1, 2, 2, 1),
                     window_specification=(4, 2, 7, 2),
                     global_attention_blocks=(3,),
                     use_high_res_features=True)
    images = jnp.zeros((1, 2, 128, 128, 3))
    prompts = {"prompt_point": jnp.zeros((1, 1, 3)),
               "prompt_box": jnp.zeros((1, 4)),
               "prompt_box_valid": jnp.zeros((1,)),
               "prompt_mask": jnp.zeros((1, 32, 32, 1)),
               "prompt_mask_valid": jnp.zeros((1,))}
    v = jnet.init({"params": jax.random.PRNGKey(0)}, images, prompts)

    pf, cf = convert_sam2_state_dict(tnet.state_dict())
    params, _ = merge_converted(v["params"], {}, pf, {})
    constants, _ = merge_converted(v["constants"], {}, cf, {})
    return tnet, jnet, {"params": params, "constants": constants}


def test_sam2_full_converter_covers_tree(sam2_pair):
    """Every flax leaf must be filled by the converter (no silent
    random-init leftovers)."""
    import jax
    from simpleaicv_pytorch_training_examples_tpu.utils.torch_convert import (
        convert_sam2_state_dict)

    tnet, jnet, v = sam2_pair
    pf, cf = convert_sam2_state_dict(tnet.state_dict())
    flat = jax.tree_util.tree_flatten_with_path(v["params"])[0]
    names = {".".join(str(getattr(p, "key", "")) for p in path)
             for path, _ in flat}
    missing = sorted(n for n in names if n not in pf)
    assert not missing, missing[:10]


def test_sam2_memory_encoder_parity(sam2_pair):
    import torch
    import jax.numpy as jnp
    tnet, jnet, v = sam2_pair
    rs = np.random.RandomState(0)
    feat = rs.rand(1, 8, 8, 256).astype(np.float32)
    mask = (rs.rand(1, 128, 128, 1) * 8 - 4).astype(np.float32)
    with torch.no_grad():
        t_feat, t_pos = tnet.memory_encoder(
            torch.from_numpy(feat.transpose(0, 3, 1, 2)),
            torch.from_numpy(mask.transpose(0, 3, 1, 2)))
    j_feat, j_pos = jnet.apply(
        v, jnp.asarray(feat), jnp.asarray(mask),
        method=lambda mdl, f, m: mdl.memory_encoder(f, m))
    np.testing.assert_allclose(t_feat.numpy().transpose(0, 2, 3, 1),
                               np.asarray(j_feat), atol=2e-4)
    np.testing.assert_allclose(t_pos.numpy().transpose(0, 2, 3, 1),
                               np.asarray(j_pos), atol=2e-4)


def test_sam2_memory_attention_parity(sam2_pair):
    import torch
    import jax.numpy as jnp
    tnet, jnet, v = sam2_pair
    rs = np.random.RandomState(1)
    n, m_rope, n_ptr = 64, 128, 4  # 8x8 grid; 2 rope repeats; 4 pointers
    curr = rs.randn(1, n, 256).astype(np.float32)
    curr_pos = rs.randn(1, n, 256).astype(np.float32)
    memory = rs.randn(1, m_rope + n_ptr, 64).astype(np.float32)
    memory_pos = rs.randn(1, m_rope + n_ptr, 64).astype(np.float32)
    with torch.no_grad():
        t_out = tnet.memory_attention(
            curr=[torch.from_numpy(curr.transpose(1, 0, 2))],
            curr_pos=[torch.from_numpy(curr_pos.transpose(1, 0, 2))],
            memory=torch.from_numpy(memory.transpose(1, 0, 2)),
            memory_pos=torch.from_numpy(memory_pos.transpose(1, 0, 2)),
            num_obj_ptr_tokens=n_ptr).numpy().transpose(1, 0, 2)
    j_out = jnet.apply(
        v, jnp.asarray(curr), jnp.asarray(memory), jnp.asarray(curr_pos),
        jnp.asarray(memory_pos),
        method=lambda mdl, c, mem, cp, mp: mdl.memory_attention(
            c, mem, cp, mp, num_obj_ptr_tokens=n_ptr))
    np.testing.assert_allclose(t_out, np.asarray(j_out), atol=3e-4)


def test_sam2_prompt_and_mask_decoder_parity(sam2_pair):
    import torch
    import jax
    import jax.numpy as jnp
    tnet, jnet, v = sam2_pair
    rs = np.random.RandomState(2)
    points = np.array([[[40.0, 60.0, 1.0], [90.0, 20.0, 0.0]]], np.float32)
    with torch.no_grad():
        t_sparse, t_dense = tnet.prompt_encoder(
            torch.from_numpy(points), None, None)
        t_pe = tnet.prompt_encoder.get_dense_pe_layer()
    j_sparse, j_dense = jnet.apply(
        v, jnp.asarray(points),
        method=lambda mdl, p: mdl.prompt_encoder(p, None, None))
    np.testing.assert_allclose(t_sparse.detach().numpy(), np.asarray(j_sparse),
                               atol=2e-4)
    np.testing.assert_allclose(
        t_dense.detach().numpy().transpose(0, 2, 3, 1),
        np.broadcast_to(np.asarray(j_dense), (1, 8, 8, 256)), atol=2e-4)

    feat = rs.rand(1, 8, 8, 256).astype(np.float32)
    s0 = rs.rand(1, 32, 32, 256).astype(np.float32)
    s1 = rs.rand(1, 16, 16, 256).astype(np.float32)
    with torch.no_grad():
        t_masks, t_ious, t_tokens, t_obj = tnet.mask_decoder(
            torch.from_numpy(feat.transpose(0, 3, 1, 2)), t_pe,
            t_sparse, t_dense,
            high_res_features=[
                torch.from_numpy(s0.transpose(0, 3, 1, 2)),
                torch.from_numpy(s1.transpose(0, 3, 1, 2))])

    def run_decoder(mdl, f, sp, s0, s1):
        pe = mdl.prompt_encoder.get_dense_pe_layer()
        dense = jnp.broadcast_to(
            mdl.prompt_encoder.no_mask_embed.reshape(1, 1, 1, -1), f.shape)
        return mdl.mask_decoder(f, pe, sp, dense,
                                high_res_features=(s0, s1))

    j_masks, j_ious, j_tokens, j_obj = jnet.apply(
        v, jnp.asarray(feat), j_sparse, jnp.asarray(s0), jnp.asarray(s1),
        method=run_decoder)
    np.testing.assert_allclose(t_masks.detach().numpy(), np.asarray(j_masks),
                               atol=3e-3)
    # reference applies sigmoid to iou preds inside the decoder
    np.testing.assert_allclose(
        t_ious.detach().numpy(),
        np.asarray(jnp.squeeze(jax.nn.sigmoid(j_ious), ())), atol=2e-4)
    np.testing.assert_allclose(t_obj.detach().numpy(), np.asarray(j_obj), atol=2e-4)


def test_dinov3_vit_feature_parity_with_reference():
    """Same converted weights -> same grid features for the DINOv3 RoPE
    ViT (incl. the k-bias mask fold and the periods-buffer match)."""
    import types
    # the reference detection package imports torchvision at module scope;
    # only transforms' name is touched at import time — stub it
    for name in ("torchvision", "torchvision.transforms",
                 "torchvision.ops"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["torchvision"].transforms = \
        sys.modules["torchvision.transforms"]
    sys.path.insert(0, REFERENCE)
    import importlib
    import torch
    ref = importlib.import_module(
        "SimpleAICV.detection.models.backbones.dinov3vit")

    torch.manual_seed(0)
    tnet = ref._dinov3vitbackbone(
        patch_size=16, embedding_planes=64,
        pos_embed_rope_normalize_coords="separate",
        pos_embed_rope_rescale_coords=2, block_nums=2, head_nums=2,
        ffn_ratio=4, qkv_bias=True, ffn_layer="mlp").eval()
    sd = tnet.state_dict()

    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.models.backbones.dinov3_vit import (
        DinoVisionTransformer, rope_sincos)
    from simpleaicv_pytorch_training_examples_tpu.utils.torch_convert import (
        convert_dinov3_vit_state_dict, merge_converted)

    # the checkpoint's periods buffer must equal our base-formula periods
    d4 = (64 // 2) // 4
    periods = 100.0**(2 * np.arange(d4) / (64 // 2 // 2))
    np.testing.assert_allclose(sd["rope_embed.periods"].numpy(), periods,
                               rtol=1e-6)

    jnet = DinoVisionTransformer(16, 64, 2, 2, ffn_layer="mlp")
    v = jnet.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    pf, _ = convert_dinov3_vit_state_dict(sd)
    params, _ = merge_converted(v["params"], {}, pf, {})

    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        t_out = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    t_out = (t_out[-1] if isinstance(t_out, (list, tuple)) else
             t_out).detach().numpy()
    j_out = np.asarray(jnet.apply({"params": params}, jnp.asarray(x)))
    if t_out.shape != j_out.shape:
        if t_out.ndim == 4 and t_out.shape[1] == j_out.shape[-1]:
            t_out = t_out.transpose(0, 2, 3, 1)
        else:
            t_out = t_out.reshape(j_out.shape)
    np.testing.assert_allclose(t_out, j_out, atol=3e-5)


def test_dinov3_rope_train_augmentation():
    """Train-time RoPE coordinate rescale (reference
    pos_embed_rope_rescale_coords=2, applied only under self.training):
    augmented tables differ per rng and from the static tables; eval
    path stays the deterministic static table."""
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.models.backbones.dinov3_vit import (
        rope_sincos, rope_sincos_augmented)

    s0, c0 = rope_sincos(4, 4, 32)
    s1, _ = rope_sincos_augmented(4, 4, 32, 100.0, jax.random.PRNGKey(1),
                                  rescale_coords=2.0)
    s2, _ = rope_sincos_augmented(4, 4, 32, 100.0, jax.random.PRNGKey(2),
                                  rescale_coords=2.0)
    s1b, _ = rope_sincos_augmented(4, 4, 32, 100.0, jax.random.PRNGKey(1),
                                   rescale_coords=2.0)
    assert float(jnp.abs(s1 - s0).max()) > 1e-3
    assert float(jnp.abs(s1 - s2).max()) > 1e-3
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s1b))
    # no augmentation args -> exactly the static table
    s3, c3 = rope_sincos_augmented(4, 4, 32, 100.0, jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(s3), np.asarray(s0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c3), np.asarray(c0), atol=1e-6)


def test_convert_cli_sam2_mapping(tmp_path, monkeypatch):
    """tools/weight_convert CLI --mapping sam2: tiny reference checkpoint
    -> orbax best tree with params + prompt-encoder constants, loadable
    by CheckpointStore."""
    import torch

    sys.path.insert(0, REFERENCE)
    from SimpleAICV.video_interactive_segmentation.models.segment_anything2.sam2video_train import (
        _sam2video)

    torch.manual_seed(0)
    tnet = _sam2video(
        image_size=128, patch_size=16, image_encoder_embedding_planes=32,
        image_encoder_head_nums=1, image_encoder_block_nums=[1, 2, 2, 1],
        image_encoder_window_position_embedding_bkg_spatial_size=[7, 7],
        image_encoder_window_specification=[4, 2, 7, 2],
        image_encoder_global_attention_blocks=[3],
        prompt_encoder_embedding_planes=256)
    ckpt = tmp_path / "sam2_tiny.pth"
    torch.save(tnet.state_dict(), str(ckpt))

    # a tiny factory the CLI can resolve by name
    from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.models.segment_anything2 import (
        sam2 as sam2_models)

    def _tiny(**kw):
        kw.setdefault("embedding_planes", 32)
        kw.setdefault("head_nums", 1)
        kw.setdefault("block_nums", (1, 2, 2, 1))
        kw.setdefault("window_specification", (4, 2, 7, 2))
        kw.setdefault("global_attention_blocks", (3,))
        return sam2_models.SAM2Video(**kw)

    monkeypatch.setattr(sam2_models, "sam2_tiny_test_video", _tiny,
                        raising=False)

    tools_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools", "weight_convert")
    sys.path.insert(0, tools_dir)
    try:
        from convert_torch_weight_to_orbax import main as cli_main
        out = tmp_path / "orbax_out"
        sys.argv = ["cli", "--torch-ckpt", str(ckpt), "--mapping", "sam2",
                    "--network", "sam2_tiny_test_video",
                    "--input-size", "128", "--output", str(out)]
        cli_main()
    finally:
        sys.path.remove(tools_dir)

    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.utils.checkpoint import (
        CheckpointStore)
    store = CheckpointStore(str(out))
    model = _tiny(image_size=128, use_high_res_features=True)
    probe = {"prompt_point": jnp.zeros((1, 1, 3)),
             "prompt_box": jnp.zeros((1, 4)),
             "prompt_box_valid": jnp.zeros((1,)),
             "prompt_mask": jnp.zeros((1, 32, 32, 1)),
             "prompt_mask_valid": jnp.zeros((1,))}
    abstract = dict(model.init({"params": jax.random.PRNGKey(0)},
                               jnp.zeros((1, 2, 128, 128, 3)), probe))
    restored = store.restore_best(abstract)
    assert "params" in restored and "constants" in restored
    assert "mask_decoder" in restored["params"]
    # tracked-frame params made it into the checkpoint (2-frame CLI init)
    assert "memory_attention" in restored["params"]
    assert "object_pointer_time_position_projection" in restored["params"]
    tpos = restored["params"][
        "object_pointer_time_position_projection"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(tpos),
        tnet.object_pointer_time_position_projection.weight.detach()
        .numpy().T, atol=1e-6)
    gm = restored["constants"]["prompt_encoder"]["pe_layer"][
        "positional_encoding_gaussian_matrix"]
    np.testing.assert_allclose(
        np.asarray(gm),
        tnet.prompt_encoder.pe_layer
        .positional_encoding_gaussian_matrix.numpy(), atol=1e-6)


def test_sam_full_model_parity_with_reference():
    """Full-model parity for SAM (task 13): same converted weights, same
    image and point prompt -> same upsampled mask logits and iou preds
    through encoder + prompt encoder + two-way decoder end to end."""
    sys.path.insert(0, REFERENCE)
    import torch
    import jax
    import jax.numpy as jnp
    from SimpleAICV.interactive_segmentation.models.segment_anything.sam import (
        _sam as torch_sam)
    from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation.models.segment_anything.sam import (
        SAM)
    from simpleaicv_pytorch_training_examples_tpu.utils.torch_convert import (
        convert_sam_state_dict, merge_converted)

    torch.manual_seed(0)
    tnet = torch_sam(image_size=128, patch_size=16,
                     image_encoder_embedding_planes=64,
                     image_encoder_block_nums=2,
                     image_encoder_head_nums=2,
                     image_encoder_global_attn_indexes=[1],
                     prompt_encoder_embedding_planes=64).eval()

    jnet = SAM(image_size=128, image_encoder_embedding_planes=64,
               image_encoder_block_nums=2, image_encoder_head_nums=2,
               image_encoder_global_attn_indexes=(1,),
               prompt_encoder_embedding_planes=64)
    probe = {"prompt_point": jnp.zeros((1, 1, 3)),
             "prompt_box": jnp.zeros((1, 4)),
             "prompt_box_valid": jnp.zeros((1,)),
             "prompt_mask": jnp.zeros((1, 32, 32, 1)),
             "prompt_mask_valid": jnp.zeros((1,))}
    v = jnet.init({"params": jax.random.PRNGKey(0)},
                  jnp.zeros((1, 128, 128, 3)), probe)

    pf, cf = convert_sam_state_dict(tnet.state_dict())
    # converter must fill every leaf
    flat = jax.tree_util.tree_flatten_with_path(v["params"])[0]
    names = {".".join(str(getattr(p, "key", "")) for p in path)
             for path, _ in flat}
    missing = sorted(n for n in names if n not in pf)
    assert not missing, missing[:8]
    params, _ = merge_converted(v["params"], {}, pf, {})
    constants, _ = merge_converted(v["constants"], {}, cf, {})

    x = np.random.RandomState(0).rand(1, 128, 128, 3).astype(np.float32)
    points = np.asarray([[[40.0, 60.0, 1.0]]], np.float32)
    with torch.no_grad():
        t_masks, t_ious = tnet(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            {"prompt_point": torch.from_numpy(points),
             "prompt_box": None, "prompt_mask": None})
    j_masks, j_ious = jnet.apply(
        {"params": params, "constants": constants}, jnp.asarray(x),
        {"prompt_point": jnp.asarray(points), "prompt_box": None,
         "prompt_mask": None})
    np.testing.assert_allclose(t_masks.detach().numpy(),
                               np.asarray(j_masks), atol=2e-2, rtol=1e-3)
    np.testing.assert_allclose(t_ious.detach().numpy(),
                               np.asarray(j_ious), atol=1e-3)


def test_dinov3_convnext_feature_parity_with_reference():
    """Same converted weights -> same 4-level features for the ConvNeXt
    detection backbone (reference detection/models/backbones/
    dinov3convnext.py), tiny variant at reduced depth."""
    import types
    for name in ("torchvision", "torchvision.transforms",
                 "torchvision.ops"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["torchvision"].transforms = \
        sys.modules["torchvision.transforms"]
    sys.path.insert(0, REFERENCE)
    import importlib
    import torch
    ref = importlib.import_module(
        "SimpleAICV.detection.models.backbones.dinov3convnext")

    torch.manual_seed(0)
    tnet = ref.Dinov3ConvNeXtBackbone(embedding_planes=[32, 64, 96, 128],
                                      block_nums=[2, 2, 3, 2]).eval()
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}

    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.models.backbones.dinov3_convnext import (
        Dinov3ConvNeXtBackbone)
    from simpleaicv_pytorch_training_examples_tpu.utils.torch_convert import (
        convert_dinov3_convnext_state_dict, merge_converted)

    jnet = Dinov3ConvNeXtBackbone(embedding_planes=(32, 64, 96, 128),
                                  block_nums=(2, 2, 3, 2))
    v = jnet.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    pf, _ = convert_dinov3_convnext_state_dict(sd)
    missing = sorted(n for n in pf
                     if n.replace(".", "/") not in
                     {"/".join(p) for p in _flat_paths(v["params"])})
    params, _ = merge_converted(v["params"], {}, pf, {})

    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        t_outs = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    j_outs = jnet.apply({"params": params}, jnp.asarray(x))
    assert len(t_outs) == len(j_outs) == 4
    for t_o, j_o in zip(t_outs, j_outs):
        np.testing.assert_allclose(
            t_o.permute(0, 2, 3, 1).numpy(), np.asarray(j_o),
            atol=2e-5, rtol=1e-4)


def _flat_paths(tree, prefix=()):
    if isinstance(tree, dict):
        for k, sub in tree.items():
            yield from _flat_paths(sub, prefix + (k,))
    else:
        yield prefix


def test_retinanet_full_detector_parity_with_reference():
    """VERDICT r3 next #8: a published reference RetinaNet checkpoint can
    drive this framework's pinned COCO AP protocol — same weights -> same
    sigmoided cls probs and reg deltas at every FPN level."""
    import torch
    import types
    for name in ("torchvision", "torchvision.transforms",
                 "torchvision.ops"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["torchvision"].transforms = \
        sys.modules["torchvision.transforms"]
    sys.path.insert(0, REFERENCE)
    from SimpleAICV.detection.models.retinanet import resnet18_retinanet as \
        torch_retinanet

    torch.manual_seed(0)
    tmodel = torch_retinanet(num_classes=20)
    tmodel.eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.detection.models.retinanet import (
        resnet18_retinanet)
    from simpleaicv_pytorch_training_examples_tpu.engine import init_model
    from simpleaicv_pytorch_training_examples_tpu.utils.torch_convert import (
        convert_retinanet_state_dict, merge_converted)

    model = resnet18_retinanet(num_classes=20)
    params, variables = init_model(model, (1, 256, 256, 3),
                                   jax.random.PRNGKey(0))
    p_flat, s_flat = convert_retinanet_state_dict(sd)
    tree_paths = {"/".join(p) for p in _flat_paths(params)}
    missing = [n for n in p_flat if n.replace(".", "/") not in tree_paths]
    assert not missing, f"unmapped converter keys: {missing[:8]}"
    params, batch_stats = merge_converted(params, variables["batch_stats"],
                                          p_flat, s_flat)

    rs = np.random.RandomState(0)
    x = rs.rand(1, 256, 256, 3).astype(np.float32)
    with torch.no_grad():
        t_cls, t_reg = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    j_cls, j_reg = model.apply({"params": params,
                                "batch_stats": batch_stats},
                               jnp.asarray(x), train=False)
    assert len(t_cls) == len(j_cls) == 5
    for t_o, j_o in zip(t_cls, j_cls):  # [B,H,W,A,C] both sides
        np.testing.assert_allclose(t_o.numpy(), np.asarray(j_o),
                                   atol=2e-4, rtol=1e-3)
    for t_o, j_o in zip(t_reg, j_reg):
        np.testing.assert_allclose(t_o.numpy(), np.asarray(j_o),
                                   atol=2e-3, rtol=1e-2)


def test_fcos_full_detector_parity_with_reference():
    import torch
    import types
    for name in ("torchvision", "torchvision.transforms",
                 "torchvision.ops"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["torchvision"].transforms = \
        sys.modules["torchvision.transforms"]
    sys.path.insert(0, REFERENCE)
    from SimpleAICV.detection.models.fcos import resnet18_fcos as torch_fcos

    torch.manual_seed(0)
    tmodel = torch_fcos(num_classes=20)
    tmodel.eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.detection.models.fcos import (
        resnet18_fcos)
    from simpleaicv_pytorch_training_examples_tpu.engine import init_model
    from simpleaicv_pytorch_training_examples_tpu.utils.torch_convert import (
        convert_fcos_state_dict, merge_converted)

    model = resnet18_fcos(num_classes=20)
    params, variables = init_model(model, (1, 256, 256, 3),
                                   jax.random.PRNGKey(0))
    p_flat, s_flat = convert_fcos_state_dict(sd)
    tree_paths = {"/".join(p) for p in _flat_paths(params)}
    missing = [n for n in p_flat if n.replace(".", "/") not in tree_paths]
    assert not missing, f"unmapped converter keys: {missing[:8]}"
    params, batch_stats = merge_converted(params, variables["batch_stats"],
                                          p_flat, s_flat)

    rs = np.random.RandomState(0)
    x = rs.rand(1, 256, 256, 3).astype(np.float32)
    with torch.no_grad():
        t_cls, t_reg, t_cnt = tmodel(torch.from_numpy(
            x.transpose(0, 3, 1, 2)))
    j_cls, j_reg, j_cnt = model.apply({"params": params,
                                       "batch_stats": batch_stats},
                                      jnp.asarray(x), train=False)
    for t_o, j_o in zip(t_cls, j_cls):  # [B,H,W,C] both sides
        np.testing.assert_allclose(t_o.numpy(), np.asarray(j_o),
                                   atol=2e-4, rtol=1e-3)
    for t_o, j_o in zip(t_reg, j_reg):
        np.testing.assert_allclose(t_o.numpy(), np.asarray(j_o),
                                   atol=2e-2, rtol=1e-2)
    for t_o, j_o in zip(t_cnt, j_cnt):
        np.testing.assert_allclose(t_o.numpy(), np.asarray(j_o),
                                   atol=2e-4, rtol=1e-3)


def _torchvision_stub():
    import types
    for name in ("torchvision", "torchvision.transforms",
                 "torchvision.ops"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["torchvision"].transforms = \
        sys.modules["torchvision.transforms"]


def test_pfan_semantic_segmentation_logit_parity_with_reference():
    """Head-converter parity (VERDICT r4 next #7): the published PFAN
    seg/parsing checkpoints (/root/reference/RESULTS.md tasks 04/11/12)
    can seed this framework's PFANSemanticSegmentation."""
    import torch
    _torchvision_stub()
    sys.path.insert(0, REFERENCE)
    from SimpleAICV.semantic_segmentation.models.pfan_semantic_segmentation import (
        resnet18_pfan_semantic_segmentation)

    torch.manual_seed(0)
    tmodel = resnet18_pfan_semantic_segmentation(num_classes=5)
    tmodel.eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.engine import init_model
    from simpleaicv_pytorch_training_examples_tpu.models.pfan import (
        PFANSemanticSegmentation)
    from simpleaicv_pytorch_training_examples_tpu.utils.torch_convert import (
        convert_pfan_state_dict, merge_converted)

    model = PFANSemanticSegmentation(backbone_type="resnet18",
                                     num_classes=5)
    params, variables = init_model(model, (1, 64, 64, 3),
                                   jax.random.PRNGKey(0))
    p_flat, s_flat = convert_pfan_state_dict(sd, head="semantic")
    tree_paths = {"/".join(p) for p in _flat_paths(params)}
    missing = [n for n in p_flat if n.replace(".", "/") not in tree_paths]
    assert not missing, f"unmapped converter keys: {missing[:8]}"
    params, batch_stats = merge_converted(params, variables["batch_stats"],
                                          p_flat, s_flat)

    rs = np.random.RandomState(0)
    x = rs.rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    j_out = np.asarray(model.apply(
        {"params": params, "batch_stats": batch_stats}, jnp.asarray(x),
        train=False))
    np.testing.assert_allclose(j_out.transpose(0, 3, 1, 2), t_out,
                               atol=1e-3, rtol=1e-3)


def test_pfan_matting_parity_with_reference():
    """Twin-decoder matting head converter (tasks 07) vs the reference's
    PFANMatting (global trimap + local alpha + collaborative fusion)."""
    import torch
    _torchvision_stub()
    sys.path.insert(0, REFERENCE)
    from SimpleAICV.human_matting.models.pfan_matting import (
        resnet18_pfan_matting)

    torch.manual_seed(0)
    tmodel = resnet18_pfan_matting()
    tmodel.eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.engine import init_model
    from simpleaicv_pytorch_training_examples_tpu.models.pfan import (
        PFANMatting)
    from simpleaicv_pytorch_training_examples_tpu.utils.torch_convert import (
        convert_pfan_state_dict, merge_converted)

    model = PFANMatting(backbone_type="resnet18")
    params, variables = init_model(model, (1, 64, 64, 3),
                                   jax.random.PRNGKey(0))
    p_flat, s_flat = convert_pfan_state_dict(sd, head="matting")
    tree_paths = {"/".join(p) for p in _flat_paths(params)}
    missing = [n for n in p_flat if n.replace(".", "/") not in tree_paths]
    assert not missing, f"unmapped converter keys: {missing[:8]}"
    params, batch_stats = merge_converted(params, variables["batch_stats"],
                                          p_flat, s_flat)

    rs = np.random.RandomState(0)
    x = rs.rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        t_g, t_l, t_f = [o.numpy() for o in tmodel(
            torch.from_numpy(x.transpose(0, 3, 1, 2)))]
    j_g, j_l, j_f = model.apply(
        {"params": params, "batch_stats": batch_stats}, jnp.asarray(x),
        train=False)
    np.testing.assert_allclose(np.asarray(j_g).transpose(0, 3, 1, 2), t_g,
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(j_l).transpose(0, 3, 1, 2), t_l,
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(j_f).transpose(0, 3, 1, 2), t_f,
                               atol=1e-3, rtol=1e-3)


def test_dbnet_map_parity_with_reference():
    """DBNet head converter (task 08): published text-detection
    checkpoints can seed this framework's DBNet."""
    import torch
    _torchvision_stub()
    sys.path.insert(0, REFERENCE)
    from SimpleAICV.text_detection.models.dbnet import resnet18_dbnet \
        as torch_dbnet

    torch.manual_seed(0)
    tmodel = torch_dbnet(inter_planes=64)
    tmodel.eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.engine import init_model
    from simpleaicv_pytorch_training_examples_tpu.text_detection.models import (
        resnet18_dbnet)
    from simpleaicv_pytorch_training_examples_tpu.utils.torch_convert import (
        convert_dbnet_state_dict, merge_converted)

    model = resnet18_dbnet(inter_planes=64)
    params, variables = init_model(model, (1, 64, 64, 3),
                                   jax.random.PRNGKey(0))
    p_flat, s_flat = convert_dbnet_state_dict(sd)
    tree_paths = {"/".join(p) for p in _flat_paths(params)}
    missing = [n for n in p_flat if n.replace(".", "/") not in tree_paths]
    assert not missing, f"unmapped converter keys: {missing[:8]}"
    params, batch_stats = merge_converted(params, variables["batch_stats"],
                                          p_flat, s_flat)

    rs = np.random.RandomState(0)
    x = rs.rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    j_out = np.asarray(model.apply(
        {"params": params, "batch_stats": batch_stats}, jnp.asarray(x),
        train=False))
    np.testing.assert_allclose(j_out.transpose(0, 3, 1, 2), t_out,
                               atol=1e-3, rtol=1e-3)


def test_ctc_model_logit_parity_with_reference():
    """CTC recognizer converter (task 09): OCR-stride resnet backbone +
    stacked BiLSTM encoder + 2-linear predictor, leaf-for-leaf vs the
    reference CTCModel (incl. torch nn.LSTM gate repacking)."""
    import torch
    _torchvision_stub()
    sys.path.insert(0, REFERENCE)
    from SimpleAICV.text_recognition.models.ctc_model import CTCModel \
        as TorchCTCModel

    torch.manual_seed(0)
    tmodel = TorchCTCModel(backbone_type="resnet18backbone", planes=32,
                           num_classes=50)
    tmodel.eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.engine import init_model
    from simpleaicv_pytorch_training_examples_tpu.text_recognition.models.ctc_model import (
        CTCModel)
    from simpleaicv_pytorch_training_examples_tpu.utils.torch_convert import (
        convert_ctc_state_dict, merge_converted)

    model = CTCModel("resnet18", planes=32, num_classes=50)
    params, variables = init_model(model, (1, 32, 128, 3),
                                   jax.random.PRNGKey(0))
    p_flat, s_flat = convert_ctc_state_dict(sd)
    tree_paths = {"/".join(p) for p in _flat_paths(params)}
    missing = [n for n in p_flat if n.replace(".", "/") not in tree_paths]
    assert not missing, f"unmapped converter keys: {missing[:8]}"
    params, batch_stats = merge_converted(params, variables["batch_stats"],
                                          p_flat, s_flat)

    rs = np.random.RandomState(0)
    x = rs.rand(2, 32, 128, 3).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    j_out = np.asarray(model.apply(
        {"params": params, "batch_stats": batch_stats}, jnp.asarray(x),
        train=False))
    # [B, W', num_classes] both sides. Tolerance: the resnet C5 parity
    # noise (~2e-3, same as test_resnet18_logit_parity) is amplified by
    # two stacked LSTM recurrences over 16 steps; the LSTM gate repacking
    # itself is exact to 9e-8 (verified in isolation: torch fused [4H]
    # matmul vs flax per-gate Dense on identical weights).
    assert t_out.shape == j_out.shape, (t_out.shape, j_out.shape)
    np.testing.assert_allclose(j_out, t_out, atol=6e-3, rtol=1e-3)


def test_solov2_parity_with_reference():
    """SOLOv2 converter (task 05): published instance-seg checkpoints can
    seed this framework's SOLOV2 (mask feats + kernel/cate heads)."""
    import torch
    _torchvision_stub()
    sys.path.insert(0, REFERENCE)
    from SimpleAICV.instance_segmentation.models.solov2 import (
        resnet18_solov2)

    torch.manual_seed(0)
    tmodel = resnet18_solov2(num_classes=10)
    tmodel.eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.engine import init_model
    from simpleaicv_pytorch_training_examples_tpu.instance_segmentation.models import (
        resnet18_solov2 as jax_solov2)
    from simpleaicv_pytorch_training_examples_tpu.utils.torch_convert import (
        convert_solov2_state_dict, merge_converted)

    model = jax_solov2(num_classes=10)
    params, variables = init_model(model, (1, 128, 128, 3),
                                   jax.random.PRNGKey(0))
    p_flat, s_flat = convert_solov2_state_dict(sd)
    tree_paths = {"/".join(p) for p in _flat_paths(params)}
    missing = [n for n in p_flat if n.replace(".", "/") not in tree_paths]
    assert not missing, f"unmapped converter keys: {missing[:8]}"
    params, batch_stats = merge_converted(params, variables["batch_stats"],
                                          p_flat, s_flat)

    rs = np.random.RandomState(0)
    x = rs.rand(1, 128, 128, 3).astype(np.float32)
    with torch.no_grad():
        t_mask, t_kern, t_cate = tmodel(torch.from_numpy(
            x.transpose(0, 3, 1, 2)))
    j_mask, j_kern, j_cate = model.apply(
        {"params": params, "batch_stats": batch_stats}, jnp.asarray(x),
        train=False)
    np.testing.assert_allclose(
        np.asarray(j_mask).transpose(0, 3, 1, 2), t_mask.numpy(),
        atol=2e-3, rtol=1e-3)
    for t_o, j_o in zip(t_kern, j_kern):
        np.testing.assert_allclose(np.asarray(j_o).transpose(0, 3, 1, 2),
                                   t_o.numpy(), atol=2e-3, rtol=1e-3)
    for t_o, j_o in zip(t_cate, j_cate):
        np.testing.assert_allclose(np.asarray(j_o).transpose(0, 3, 1, 2),
                                   t_o.numpy(), atol=2e-3, rtol=1e-3)


def test_yolact_parity_with_reference():
    """YOLACT converter (task 05): heads emit [B,H,W,A,C] on both sides;
    proto/seg maps NHWC vs torch permuted outputs."""
    import torch
    _torchvision_stub()
    sys.path.insert(0, REFERENCE)
    from SimpleAICV.instance_segmentation.models.yolact import (
        resnet18_yolact)

    torch.manual_seed(0)
    tmodel = resnet18_yolact(num_classes=11)
    tmodel.eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.engine import init_model
    from simpleaicv_pytorch_training_examples_tpu.instance_segmentation.models import (
        resnet18_yolact as jax_yolact)
    from simpleaicv_pytorch_training_examples_tpu.utils.torch_convert import (
        convert_yolact_state_dict, merge_converted)

    model = jax_yolact(num_classes=11)
    params, variables = init_model(model, (1, 128, 128, 3),
                                   jax.random.PRNGKey(0))
    p_flat, s_flat = convert_yolact_state_dict(sd)
    tree_paths = {"/".join(p) for p in _flat_paths(params)}
    missing = [n for n in p_flat if n.replace(".", "/") not in tree_paths]
    assert not missing, f"unmapped converter keys: {missing[:8]}"
    params, batch_stats = merge_converted(params, variables["batch_stats"],
                                          p_flat, s_flat)

    rs = np.random.RandomState(0)
    x = rs.rand(1, 128, 128, 3).astype(np.float32)
    with torch.no_grad():
        t_cls, t_box, t_coef, t_proto, t_seg = tmodel(torch.from_numpy(
            x.transpose(0, 3, 1, 2)))
    j_cls, j_box, j_coef, j_proto, j_seg = model.apply(
        {"params": params, "batch_stats": batch_stats}, jnp.asarray(x),
        train=False)
    for t_o, j_o in zip(t_cls, j_cls):  # [B,H,W,A,C] both sides
        np.testing.assert_allclose(np.asarray(j_o), t_o.numpy(),
                                   atol=2e-3, rtol=1e-3)
    for t_o, j_o in zip(t_box, j_box):
        np.testing.assert_allclose(np.asarray(j_o), t_o.numpy(),
                                   atol=2e-3, rtol=1e-3)
    for t_o, j_o in zip(t_coef, j_coef):
        np.testing.assert_allclose(np.asarray(j_o), t_o.numpy(),
                                   atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(j_proto), t_proto.numpy(),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(j_seg).transpose(0, 3, 1, 2),
                               t_seg.numpy(), atol=2e-3, rtol=1e-3)


def test_universal_segmentation_parity_with_reference():
    """Universal segmentation converter (task 16): DINOv3-S trunk with
    in-stream query tokens + ScaleBlock upscaling + dot-product masks,
    leaf-for-leaf vs the reference UniversalSegmentation."""
    import torch
    _torchvision_stub()
    sys.path.insert(0, REFERENCE)
    from SimpleAICV.universal_segmentation.models.dinov3_universal_segmentation import (
        UniversalSegmentation as TorchUS)

    torch.manual_seed(0)
    tmodel = TorchUS(backbone_type="dinov3_vit_small_patch16_backbone",
                     image_size=128, query_num=16, num_classes=11,
                     query_block_nums=4)
    tmodel.eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.engine import init_model
    from simpleaicv_pytorch_training_examples_tpu.universal_segmentation.models import (
        UniversalSegmentation)
    from simpleaicv_pytorch_training_examples_tpu.utils.torch_convert import (
        convert_universal_segmentation_state_dict, merge_converted)

    model = UniversalSegmentation("dinov3_vit_small_patch16_backbone",
                                  image_size=128, query_num=16,
                                  num_classes=11, query_block_nums=4)
    params, variables = init_model(model, (1, 128, 128, 3),
                                   jax.random.PRNGKey(0))
    p_flat, _ = convert_universal_segmentation_state_dict(sd)
    tree_paths = {"/".join(p) for p in _flat_paths(params)}
    missing = [n for n in p_flat if n.replace(".", "/") not in tree_paths]
    assert not missing, f"unmapped converter keys: {missing[:8]}"
    params, _ = merge_converted(params, None, p_flat, {})

    rs = np.random.RandomState(0)
    x = rs.rand(1, 128, 128, 3).astype(np.float32)
    with torch.no_grad():
        t_mask, t_cls = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    j_mask, j_cls = model.apply({"params": params, **variables},
                                jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(j_cls), t_cls.numpy(),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(j_mask), t_mask.numpy(),
                               atol=5e-3, rtol=1e-3)
