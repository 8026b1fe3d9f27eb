"""Torch checkpoint -> flax weight converters.

Parity tooling for /root/reference/SimpleAICV/*/weight_convert/ scripts:
maps the reference's published torch state dicts onto this framework's
flax parameter / batch-stats trees so published weights can seed parity
runs (SURVEY.md §7 "checkpointing").

Conventions: torch conv OIHW -> flax HWIO; torch linear [O, I] -> [I, O];
BatchNorm weight/bias -> params scale/bias, running_mean/var ->
batch_stats mean/var.
"""

import re

import numpy as np

__all__ = ["convert_resnet_state_dict", "convert_vit_state_dict",
           "convert_van_state_dict", "convert_convformer_state_dict",
           "convert_dinov3_vit_state_dict",
           "convert_dinov3_convnext_state_dict",
           "convert_sam_encoder_state_dict", "convert_sam_state_dict",
           "convert_sam2_encoder_state_dict", "convert_sam2_state_dict",
           "convert_retinanet_state_dict", "convert_fcos_state_dict",
           "convert_pfan_state_dict", "convert_dbnet_state_dict",
           "convert_ctc_state_dict", "convert_solov2_state_dict",
           "convert_yolact_state_dict",
           "convert_universal_segmentation_state_dict",
           "merge_converted"]


def _conv_w(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _dw_conv_w(w):
    # torch depthwise [C,1,kh,kw] -> flax [kh,kw,1,C]
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _linear_w(w):
    return np.ascontiguousarray(np.transpose(w))


def convert_resnet_state_dict(sd):
    """Reference ResNet (classification/backbones/resnet.py naming:
    conv1.layer.{0,1}, layer{s}.{i}.conv{k}.layer.{0,1},
    layer{s}.{i}.downsample_conv.layer.{0,1}, fc) -> flax flat dicts.

    Returns (params_flat, batch_stats_flat) keyed by my dotted names
    (stem.conv.kernel, layer1_0.conv1.bn.scale, ...).
    """
    params, stats = {}, {}

    def put_convbn(torch_prefix, flax_prefix):
        w = sd.get(f"{torch_prefix}.layer.0.weight")
        if w is None:
            return False
        params[f"{flax_prefix}.conv.kernel"] = _conv_w(np.asarray(w))
        if f"{torch_prefix}.layer.1.weight" in sd:
            params[f"{flax_prefix}.bn.scale"] = np.asarray(
                sd[f"{torch_prefix}.layer.1.weight"])
            params[f"{flax_prefix}.bn.bias"] = np.asarray(
                sd[f"{torch_prefix}.layer.1.bias"])
            stats[f"{flax_prefix}.bn.mean"] = np.asarray(
                sd[f"{torch_prefix}.layer.1.running_mean"])
            stats[f"{flax_prefix}.bn.var"] = np.asarray(
                sd[f"{torch_prefix}.layer.1.running_var"])
        return True

    put_convbn("conv1", "stem")
    block_re = re.compile(r"^layer(\d)\.(\d+)\.")
    seen = set()
    for key in sd:
        m = block_re.match(key)
        if not m:
            continue
        s, i = int(m.group(1)), int(m.group(2))
        if (s, i) in seen:
            continue
        seen.add((s, i))
        for k in (1, 2, 3):
            put_convbn(f"layer{s}.{i}.conv{k}", f"layer{s}_{i}.conv{k}")
        put_convbn(f"layer{s}.{i}.downsample_conv",
                   f"layer{s}_{i}.downsample")
    if "fc.weight" in sd:
        params["fc.kernel"] = _linear_w(np.asarray(sd["fc.weight"]))
        params["fc.bias"] = np.asarray(sd["fc.bias"])
    return params, stats


def convert_vit_state_dict(sd):
    """Reference ViT (classification/backbones/vit.py naming) -> flax.

    patch_embed.proj -> patch_embedding; cls_token/pos_embed ->
    cls_token/position_encoding; blocks.{i}.{norm1,attn.qkv,attn.proj,
    norm2,mlp.fc1,mlp.fc2} -> block_{i}.*; norm -> norm; fc -> fc.
    """
    params = {}
    if "cls_token" in sd:
        params["cls_token"] = np.asarray(sd["cls_token"])
    if "pos_embed" in sd:
        params["position_encoding"] = np.asarray(sd["pos_embed"])
    if "patch_embed.proj.weight" in sd:
        params["patch_embedding.kernel"] = _conv_w(
            np.asarray(sd["patch_embed.proj.weight"]))
        if "patch_embed.proj.bias" in sd:
            params["patch_embedding.bias"] = np.asarray(
                sd["patch_embed.proj.bias"])

    block_re = re.compile(r"^blocks\.(\d+)\.")
    blocks = sorted({int(block_re.match(k).group(1))
                     for k in sd if block_re.match(k)})
    for i in blocks:
        t = f"blocks.{i}"
        f = f"block_{i}"
        for norm in ("norm1", "norm2"):
            params[f"{f}.{norm}.scale"] = np.asarray(
                sd[f"{t}.{norm}.weight"])
            params[f"{f}.{norm}.bias"] = np.asarray(sd[f"{t}.{norm}.bias"])
        for torch_name, flax_name in (
                ("attn.qkv", "attn.qkv"), ("attn.proj", "attn.proj"),
                ("mlp.fc1", "mlp.fc1"), ("mlp.fc2", "mlp.fc2")):
            # reference FeedForward may name layers differently; accept
            # both fcX and linearX
            for cand in (torch_name, torch_name.replace("fc", "linear")):
                wk = f"{t}.{cand}.weight"
                if wk in sd:
                    params[f"{f}.{flax_name}.kernel"] = _linear_w(
                        np.asarray(sd[wk]))
                    bk = f"{t}.{cand}.bias"
                    if bk in sd:
                        params[f"{f}.{flax_name}.bias"] = np.asarray(
                            sd[bk])
                    break
    if "norm.weight" in sd:
        params["norm.scale"] = np.asarray(sd["norm.weight"])
        params["norm.bias"] = np.asarray(sd["norm.bias"])
    if "fc.weight" in sd:
        params["fc.kernel"] = _linear_w(np.asarray(sd["fc.weight"]))
        params["fc.bias"] = np.asarray(sd["fc.bias"])
    return params, {}


def merge_converted(params_tree, batch_stats_tree, params_flat,
                    stats_flat, logger=None):
    """Merge converted flat dicts into (params, batch_stats) pytrees."""
    from .checkpoint import load_params_filtered
    merged_params, n1, t1 = load_params_filtered(params_flat, params_tree,
                                                 logger)
    if stats_flat and batch_stats_tree:
        merged_stats, n2, t2 = load_params_filtered(stats_flat,
                                                    batch_stats_tree,
                                                    logger)
    else:
        merged_stats = batch_stats_tree
        n2 = 0
    if logger:
        logger.info(f"converted: {n1}/{t1} params, {n2} batch stats")
    return merged_params, merged_stats


def convert_dinov3_convnext_state_dict(sd):
    """Reference Dinov3ConvNeXtBackbone (detection/models/backbones/
    dinov3convnext.py:120-193 naming: downsample_layers.{i}.{0,1},
    stages.{i}.{j}.{dwconv,norm,pwconv1,pwconv2,gamma}) -> this
    framework's Dinov3ConvNeXtBackbone flat params (stem_conv/stem_norm,
    downsample{i}_{norm,conv}, stage{i}_block{j}.*). No batch stats
    (LayerNorm only)."""
    params = {}
    arr = lambda k: np.asarray(sd[k])
    params["stem_conv.kernel"] = _conv_w(arr("downsample_layers.0.0.weight"))
    params["stem_conv.bias"] = arr("downsample_layers.0.0.bias")
    params["stem_norm.scale"] = arr("downsample_layers.0.1.weight")
    params["stem_norm.bias"] = arr("downsample_layers.0.1.bias")
    i = 1
    while f"downsample_layers.{i}.0.weight" in sd:
        params[f"downsample{i}_norm.scale"] = arr(
            f"downsample_layers.{i}.0.weight")
        params[f"downsample{i}_norm.bias"] = arr(
            f"downsample_layers.{i}.0.bias")
        params[f"downsample{i}_conv.kernel"] = _conv_w(
            arr(f"downsample_layers.{i}.1.weight"))
        params[f"downsample{i}_conv.bias"] = arr(
            f"downsample_layers.{i}.1.bias")
        i += 1
    block_re = re.compile(r"^stages\.(\d+)\.(\d+)\.dwconv\.weight$")
    for key in sd:
        m = block_re.match(key)
        if not m:
            continue
        i, j = int(m.group(1)), int(m.group(2))
        t, f = f"stages.{i}.{j}", f"stage{i}_block{j}"
        params[f"{f}.dwconv.kernel"] = _dw_conv_w(arr(f"{t}.dwconv.weight"))
        params[f"{f}.dwconv.bias"] = arr(f"{t}.dwconv.bias")
        params[f"{f}.norm.scale"] = arr(f"{t}.norm.weight")
        params[f"{f}.norm.bias"] = arr(f"{t}.norm.bias")
        params[f"{f}.pwconv1.kernel"] = _linear_w(arr(f"{t}.pwconv1.weight"))
        params[f"{f}.pwconv1.bias"] = arr(f"{t}.pwconv1.bias")
        params[f"{f}.pwconv2.kernel"] = _linear_w(arr(f"{t}.pwconv2.weight"))
        params[f"{f}.pwconv2.bias"] = arr(f"{t}.pwconv2.bias")
        params[f"{f}.gamma"] = arr(f"{t}.gamma")
    return params, {}


def convert_van_state_dict(sd):
    """Reference VAN (classification/backbones/van.py naming:
    patch_embed{i}.proj / patch_embed{i}.norm / block{i}.{j}.* /
    norm{i} / head) -> this framework's VAN
    (patch_embed{i} conv, patch_norm{i} BN, block{i}_{j}.*, norm{i} BN,
    head). Depthwise convs ([C,1,k,k]) transpose to [k,k,1,C]."""
    params, stats = {}, {}

    def put_bn(tp, fp):
        params[f"{fp}.scale"] = np.asarray(sd[f"{tp}.weight"])
        params[f"{fp}.bias"] = np.asarray(sd[f"{tp}.bias"])
        stats[f"{fp}.mean"] = np.asarray(sd[f"{tp}.running_mean"])
        stats[f"{fp}.var"] = np.asarray(sd[f"{tp}.running_var"])

    def put_conv(tp, fp, depthwise=False):
        w = np.asarray(sd[f"{tp}.weight"])
        params[f"{fp}.kernel"] = _dw_conv_w(w) if depthwise else _conv_w(w)
        if f"{tp}.bias" in sd:
            params[f"{fp}.bias"] = np.asarray(sd[f"{tp}.bias"])

    n_stages = max(int(k.split(".")[0][-1]) for k in sd
                   if k.startswith("patch_embed"))
    for i in range(1, n_stages + 1):
        put_conv(f"patch_embed{i}.proj", f"patch_embed{i}")
        put_bn(f"patch_embed{i}.norm", f"patch_norm{i}")
        put_bn(f"norm{i}", f"norm{i}")
        blocks = sorted({int(k.split(".")[1]) for k in sd
                         if k.startswith(f"block{i}.")})
        for j in blocks:
            tb = f"block{i}.{j}"
            fb = f"block{i}_{j}"
            params[f"{fb}.layer_scale_1"] = np.asarray(
                sd[f"{tb}.layer_scale_1"])
            params[f"{fb}.layer_scale_2"] = np.asarray(
                sd[f"{tb}.layer_scale_2"])
            put_bn(f"{tb}.norm1", f"{fb}.norm1")
            put_bn(f"{tb}.norm2", f"{fb}.norm2")
            put_conv(f"{tb}.attn.proj_1", f"{fb}.attn.proj_1")
            put_conv(f"{tb}.attn.proj_2", f"{fb}.attn.proj_2")
            sgu = "attn.spatial_gating_unit"
            put_conv(f"{tb}.{sgu}.conv0", f"{fb}.{sgu}.conv0",
                     depthwise=True)
            put_conv(f"{tb}.{sgu}.conv_spatial", f"{fb}.{sgu}.conv_spatial",
                     depthwise=True)
            put_conv(f"{tb}.{sgu}.conv1", f"{fb}.{sgu}.conv1")
            put_conv(f"{tb}.mlp.fc1", f"{fb}.mlp.fc1")
            put_conv(f"{tb}.mlp.dwconv.dwconv", f"{fb}.mlp.dwconv",
                     depthwise=True)
            put_conv(f"{tb}.mlp.fc2", f"{fb}.mlp.fc2")
    if "head.weight" in sd:
        params["head.kernel"] = _linear_w(np.asarray(sd["head.weight"]))
        params["head.bias"] = np.asarray(sd["head.bias"])
    return params, stats


def convert_convformer_state_dict(sd):
    """Reference ConvFormer (classification/backbones/convformer.py naming:
    downsample_layers.{i}.{conv,pre_norm,post_norm} / stages.{s}.{j}.* /
    head) -> this framework's MetaFormer (downsample{i} +
    downsample_postnorm0/_prenorm{i} BN, block{s+1}_{j}.*, head)."""
    params, stats = {}, {}

    def put_bn(tp, fp):
        params[f"{fp}.scale"] = np.asarray(sd[f"{tp}.weight"])
        params[f"{fp}.bias"] = np.asarray(sd[f"{tp}.bias"])
        stats[f"{fp}.mean"] = np.asarray(sd[f"{tp}.running_mean"])
        stats[f"{fp}.var"] = np.asarray(sd[f"{tp}.running_var"])

    def put_conv(tp, fp, depthwise=False):
        w = np.asarray(sd[f"{tp}.weight"])
        params[f"{fp}.kernel"] = _dw_conv_w(w) if depthwise else _conv_w(w)
        if f"{tp}.bias" in sd:
            params[f"{fp}.bias"] = np.asarray(sd[f"{tp}.bias"])

    def put_linear(tp, fp):
        params[f"{fp}.kernel"] = _linear_w(np.asarray(sd[f"{tp}.weight"]))
        if f"{tp}.bias" in sd:
            params[f"{fp}.bias"] = np.asarray(sd[f"{tp}.bias"])

    n_stages = max(int(k.split(".")[1]) for k in sd
                   if k.startswith("downsample_layers.")) + 1
    for i in range(n_stages):
        put_conv(f"downsample_layers.{i}.conv", f"downsample{i}")
        if i == 0:
            put_bn("downsample_layers.0.post_norm", "downsample_postnorm0")
        else:
            put_bn(f"downsample_layers.{i}.pre_norm",
                   f"downsample_prenorm{i}")
        blocks = sorted({int(k.split(".")[2]) for k in sd
                         if k.startswith(f"stages.{i}.")})
        for j in blocks:
            tb = f"stages.{i}.{j}"
            fb = f"block{i + 1}_{j}"
            put_bn(f"{tb}.norm1", f"{fb}.norm1")
            put_bn(f"{tb}.norm2", f"{fb}.norm2")
            put_linear(f"{tb}.token_mixer.pwconv1",
                       f"{fb}.token_mixer.pwconv1")
            put_conv(f"{tb}.token_mixer.dwconv",
                     f"{fb}.token_mixer.dwconv", depthwise=True)
            put_linear(f"{tb}.token_mixer.pwconv2",
                       f"{fb}.token_mixer.pwconv2")
            put_linear(f"{tb}.mlp.fc1", f"{fb}.mlp.fc1")
            put_linear(f"{tb}.mlp.fc2", f"{fb}.mlp.fc2")
    if "head.weight" in sd:
        put_linear("head", "head")
    return params, stats


def convert_sam_encoder_state_dict(sd):
    """Reference SAM ViT image encoder (interactive_segmentation/models/
    segment_anything/image_encoder.py naming: pos_embed /
    patch_embed.proj / blocks.N.{norm1,attn.{rel_pos_h,rel_pos_w,qkv,proj},
    norm2,mlp.{lin1,lin2}} / neck.{0..3}) -> this framework's
    ViTImageEncoder (position_encoding, patch_embedding, block_N.*,
    neck_conv1/neck_ln1/neck_conv2/neck_ln2). Accepts a full SAM
    checkpoint too ('image_encoder.'-prefixed keys are selected).

    Reference converter analogues: SimpleAICV/interactive_segmentation/
    weight_convert/sam_encoder_weight_convert_from_sam_offical_weight.py.
    """
    if any(k.startswith("image_encoder.") for k in sd):
        sd = {k[len("image_encoder."):]: v for k, v in sd.items()
              if k.startswith("image_encoder.")}
    params = {}

    def put_linear(tp, fp):
        params[f"{fp}.kernel"] = _linear_w(np.asarray(sd[f"{tp}.weight"]))
        if f"{tp}.bias" in sd:
            params[f"{fp}.bias"] = np.asarray(sd[f"{tp}.bias"])

    def put_ln(tp, fp, flax_scale="scale"):
        params[f"{fp}.{flax_scale}"] = np.asarray(sd[f"{tp}.weight"])
        params[f"{fp}.bias"] = np.asarray(sd[f"{tp}.bias"])

    params["position_encoding"] = np.asarray(sd["pos_embed"])
    params["patch_embedding.kernel"] = _conv_w(
        np.asarray(sd["patch_embed.proj.weight"]))
    params["patch_embedding.bias"] = np.asarray(
        sd["patch_embed.proj.bias"])

    n_blocks = max(int(k.split(".")[1]) for k in sd
                   if k.startswith("blocks.")) + 1
    for i in range(n_blocks):
        tb = f"blocks.{i}"
        fb = f"block_{i}"
        put_ln(f"{tb}.norm1", f"{fb}.norm1")
        put_ln(f"{tb}.norm2", f"{fb}.norm2")
        params[f"{fb}.attn.rel_pos_h"] = np.asarray(
            sd[f"{tb}.attn.rel_pos_h"])
        params[f"{fb}.attn.rel_pos_w"] = np.asarray(
            sd[f"{tb}.attn.rel_pos_w"])
        put_linear(f"{tb}.attn.qkv", f"{fb}.attn.qkv")
        put_linear(f"{tb}.attn.proj", f"{fb}.attn.proj")
        put_linear(f"{tb}.mlp.lin1", f"{fb}.lin1")
        put_linear(f"{tb}.mlp.lin2", f"{fb}.lin2")

    params["neck_conv1.kernel"] = _conv_w(np.asarray(sd["neck.0.weight"]))
    put_ln("neck.1", "neck_ln1", flax_scale="weight")
    params["neck_conv2.kernel"] = _conv_w(np.asarray(sd["neck.2.weight"]))
    put_ln("neck.3", "neck_ln2", flax_scale="weight")
    return params, {}


def _pad_attn_head_params(params, prefix, hd, hdp):
    """Zero-pad one attention module's qkv/proj param slices from hd to
    hdp per head (Hiera head_dim_padding; see
    video_interactive_segmentation/.../image_encoder.py
    ::MultiScaleAttention). Zero pads are EXACT: padded q/k dims add 0
    to the logits and padded v columns feed zero proj rows."""
    w = params[f"{prefix}.qkv.kernel"]
    c_in, out = w.shape
    nh = out // (3 * hd)
    w = w.reshape(c_in, 3, nh, hd)
    params[f"{prefix}.qkv.kernel"] = np.pad(
        w, ((0, 0), (0, 0), (0, 0), (0, hdp - hd))).reshape(
            c_in, 3 * nh * hdp)
    b = params[f"{prefix}.qkv.bias"].reshape(3, nh, hd)
    params[f"{prefix}.qkv.bias"] = np.pad(
        b, ((0, 0), (0, 0), (0, hdp - hd))).reshape(3 * nh * hdp)
    p = params[f"{prefix}.proj.kernel"]
    p = p.reshape(nh, hd, -1)
    params[f"{prefix}.proj.kernel"] = np.pad(
        p, ((0, 0), (0, hdp - hd), (0, 0))).reshape(nh * hdp, -1)


def convert_sam2_encoder_state_dict(sd, head_dim_padding=0):
    """Reference SAM2 Hiera image encoder (video_interactive_segmentation/
    models/segment_anything2/image_encoder.py naming: trunk.pos_embed
    (NCHW) / trunk.patch_embed.proj / trunk.blocks.N.{norm1,attn.{qkv,
    proj},norm2,mlp.layers.{0,1},proj} / neck.convs.{0..3}.conv) -> this
    framework's ImageEncoder (trunk.pos_embed NHWC, trunk.patch_embed,
    trunk.block_N.{norm1,attn.{qkv,proj},norm2,mlp1,mlp2,proj},
    conv0..conv3).

    Reference converter analogue: SimpleAICV/video_interactive_
    segmentation/weight_convert/sam2.1_encoder_weight_convert_*.py.
    Accepts a full SAM2 checkpoint ('image_encoder.'-prefixed keys).
    """
    if any(k.startswith("image_encoder.") for k in sd):
        sd = {k[len("image_encoder."):]: v for k, v in sd.items()
              if k.startswith("image_encoder.")}
    params = {}

    def put_linear(tp, fp):
        params[f"{fp}.kernel"] = _linear_w(np.asarray(sd[f"{tp}.weight"]))
        if f"{tp}.bias" in sd:
            params[f"{fp}.bias"] = np.asarray(sd[f"{tp}.bias"])

    def put_ln(tp, fp):
        params[f"{fp}.scale"] = np.asarray(sd[f"{tp}.weight"])
        params[f"{fp}.bias"] = np.asarray(sd[f"{tp}.bias"])

    # NCHW [1,C,h,w] -> NHWC
    params["trunk.pos_embed"] = np.transpose(
        np.asarray(sd["trunk.pos_embed"]), (0, 2, 3, 1))
    params["trunk.pos_embed_window"] = np.transpose(
        np.asarray(sd["trunk.pos_embed_window"]), (0, 2, 3, 1))
    params["trunk.patch_embed.kernel"] = _conv_w(
        np.asarray(sd["trunk.patch_embed.proj.weight"]))
    params["trunk.patch_embed.bias"] = np.asarray(
        sd["trunk.patch_embed.proj.bias"])

    n_blocks = max(int(k.split(".")[2]) for k in sd
                   if k.startswith("trunk.blocks.")) + 1
    for i in range(n_blocks):
        tb = f"trunk.blocks.{i}"
        fb = f"trunk.block_{i}"
        put_ln(f"{tb}.norm1", f"{fb}.norm1")
        put_ln(f"{tb}.norm2", f"{fb}.norm2")
        put_linear(f"{tb}.attn.qkv", f"{fb}.attn.qkv")
        put_linear(f"{tb}.attn.proj", f"{fb}.attn.proj")
        put_linear(f"{tb}.mlp.layers.0", f"{fb}.mlp1")
        put_linear(f"{tb}.mlp.layers.1", f"{fb}.mlp2")
        if f"{tb}.proj.weight" in sd:  # stage-transition residual proj
            put_linear(f"{tb}.proj", f"{fb}.proj")

    for i in range(4):
        w = np.asarray(sd[f"neck.convs.{i}.conv.weight"])
        params[f"conv{i}.kernel"] = _conv_w(w)
        params[f"conv{i}.bias"] = np.asarray(
            sd[f"neck.convs.{i}.conv.bias"])

    if head_dim_padding:
        # Hiera's per-head width is planes // head_nums = 56 at every
        # stage; zero-pad each block's qkv/proj slices to the target
        # model's head_dim_padding (exact — see _pad_attn_head_params)
        for i in range(n_blocks):
            _pad_attn_head_params(params, f"trunk.block_{i}.attn", 56,
                                  head_dim_padding)
    return params, {}


def convert_dinov3_vit_state_dict(sd):
    """Reference DINOv3 RoPE ViT (detection/models/backbones/dinov3vit.py
    naming: patch_embed.proj / rope_embed.periods / blocks.{i}.{norm1,
    attn.{qkv,proj},ls1,norm2,mlp.{fc1,fc2} or mlp.{w1,w2,w3},ls2} /
    norm) -> this framework's DinoVisionTransformer (patch_embedding /
    block_{i}.{norm1,attn.{qkv,proj},ls1,norm2,mlp_fc1,mlp_fc2 or
    swiglu.{w12,w3},ls2} / norm).

    The reference qkv uses LinearKMaskedBias (bias_mask zeroes the k-bias
    third); the mask is folded into the converted bias so our plain Dense
    is numerically identical. rope_embed.periods is a buffer our model
    recomputes from `rope_base` — the caller should assert it matches
    (tests/test_torch_parity.py does).
    """
    params = {}

    def put_linear(tp, fp):
        params[f"{fp}.kernel"] = _linear_w(np.asarray(sd[f"{tp}.weight"]))
        if f"{tp}.bias" in sd:
            params[f"{fp}.bias"] = np.asarray(sd[f"{tp}.bias"])

    def put_ln(tp, fp):
        params[f"{fp}.scale"] = np.asarray(sd[f"{tp}.weight"])
        params[f"{fp}.bias"] = np.asarray(sd[f"{tp}.bias"])

    params["patch_embedding.kernel"] = _conv_w(
        np.asarray(sd["patch_embed.proj.weight"]))
    params["patch_embedding.bias"] = np.asarray(
        sd["patch_embed.proj.bias"])

    block_re = re.compile(r"^blocks\.(\d+)\.")
    blocks = sorted({int(block_re.match(k).group(1))
                     for k in sd if block_re.match(k)})
    for i in blocks:
        t, f = f"blocks.{i}", f"block_{i}"
        put_ln(f"{t}.norm1", f"{f}.norm1")
        put_ln(f"{t}.norm2", f"{f}.norm2")
        params[f"{f}.attn.qkv.kernel"] = _linear_w(
            np.asarray(sd[f"{t}.attn.qkv.weight"]))
        if f"{t}.attn.qkv.bias" in sd:
            bias = np.asarray(sd[f"{t}.attn.qkv.bias"])
            if f"{t}.attn.qkv.bias_mask" in sd:
                bias = bias * np.asarray(sd[f"{t}.attn.qkv.bias_mask"])
            params[f"{f}.attn.qkv.bias"] = bias
        put_linear(f"{t}.attn.proj", f"{f}.attn.proj")
        params[f"{f}.ls1.gamma"] = np.asarray(sd[f"{t}.ls1.gamma"])
        params[f"{f}.ls2.gamma"] = np.asarray(sd[f"{t}.ls2.gamma"])
        if f"{t}.mlp.fc1.weight" in sd:
            put_linear(f"{t}.mlp.fc1", f"{f}.mlp_fc1")
            put_linear(f"{t}.mlp.fc2", f"{f}.mlp_fc2")
        else:  # SwiGLU: w1/w2 fuse into our w12, w3 maps directly
            w1 = _linear_w(np.asarray(sd[f"{t}.mlp.w1.weight"]))
            w2 = _linear_w(np.asarray(sd[f"{t}.mlp.w2.weight"]))
            params[f"{f}.swiglu.w12.kernel"] = np.concatenate(
                [w1, w2], axis=1)
            if f"{t}.mlp.w1.bias" in sd:
                params[f"{f}.swiglu.w12.bias"] = np.concatenate(
                    [np.asarray(sd[f"{t}.mlp.w1.bias"]),
                     np.asarray(sd[f"{t}.mlp.w2.bias"])])
            put_linear(f"{t}.mlp.w3", f"{f}.swiglu.w3")
    put_ln("norm", "norm")
    return params, {}


def convert_sam_state_dict(sd):
    """Full reference SAM checkpoint (interactive_segmentation/models/
    segment_anything/sam.py: image encoder + prompt encoder + two-way
    mask decoder) -> this framework's SAM tree. Same layout rules as the
    SAM2 converter, minus the object-score token / occlusion head and
    high-res skips SAM does not have.

    Returns (params_flat, constants_flat) — constants_flat carries the
    prompt encoder's fixed gaussian PE matrix.
    """
    params, constants = {}, {}
    enc_params, _ = convert_sam_encoder_state_dict(sd)
    for k, v in enc_params.items():
        params[f"image_encoder.{k}"] = v

    def put_linear(tp, fp):
        params[f"{fp}.kernel"] = _linear_w(np.asarray(sd[f"{tp}.weight"]))
        if f"{tp}.bias" in sd:
            params[f"{fp}.bias"] = np.asarray(sd[f"{tp}.bias"])

    def put_ln(tp, fp, scale_name="scale"):
        params[f"{fp}.{scale_name}"] = np.asarray(sd[f"{tp}.weight"])
        params[f"{fp}.bias"] = np.asarray(sd[f"{tp}.bias"])

    def put_conv(tp, fp):
        params[f"{fp}.kernel"] = _conv_w(np.asarray(sd[f"{tp}.weight"]))
        params[f"{fp}.bias"] = np.asarray(sd[f"{tp}.bias"])

    def put_mlp(tp, fp, n=3):
        for j in range(n):
            put_linear(f"{tp}.layers.{j}", f"{fp}.layer_{j}")

    def put_attn(tp, fp):
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            put_linear(f"{tp}.{proj}", f"{fp}.{proj}")

    # ---- prompt encoder
    constants["prompt_encoder.pe_layer."
              "positional_encoding_gaussian_matrix"] = np.asarray(
        sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"])
    params["prompt_encoder.point_embeddings"] = np.concatenate(
        [np.asarray(sd[f"prompt_encoder.point_embeddings.{i}.weight"])
         for i in range(4)], axis=0)
    params["prompt_encoder.not_a_point_embed"] = np.asarray(
        sd["prompt_encoder.not_a_point_embed.weight"])
    params["prompt_encoder.no_mask_embed"] = np.asarray(
        sd["prompt_encoder.no_mask_embed.weight"])
    put_conv("prompt_encoder.mask_downscaling.0",
             "prompt_encoder.mask_conv1")
    put_ln("prompt_encoder.mask_downscaling.1",
           "prompt_encoder.mask_ln1", scale_name="weight")
    put_conv("prompt_encoder.mask_downscaling.3",
             "prompt_encoder.mask_conv2")
    put_ln("prompt_encoder.mask_downscaling.4",
           "prompt_encoder.mask_ln2", scale_name="weight")
    put_conv("prompt_encoder.mask_downscaling.6",
             "prompt_encoder.mask_conv3")

    # ---- mask decoder (no obj_score_token / pred_obj_score_head in SAM)
    md, fd = "mask_decoder", "mask_decoder"
    for tok in ("iou_token", "mask_tokens"):
        params[f"{fd}.{tok}"] = np.asarray(sd[f"{md}.{tok}.weight"])
    for i in range(2):
        tl, fl = f"{md}.transformer.layers.{i}", \
            f"{fd}.transformer.layer_{i}"
        put_attn(f"{tl}.self_attn", f"{fl}.self_attn")
        put_attn(f"{tl}.cross_attn_token_to_image",
                 f"{fl}.cross_attn_token_to_image")
        put_attn(f"{tl}.cross_attn_image_to_token",
                 f"{fl}.cross_attn_image_to_token")
        # SAM's MLPBlock names its linears lin1/lin2 (SAM2 uses layers.N)
        put_linear(f"{tl}.mlp.lin1", f"{fl}.mlp_lin1")
        put_linear(f"{tl}.mlp.lin2", f"{fl}.mlp_lin2")
        for n in ("norm1", "norm2", "norm3", "norm4"):
            put_ln(f"{tl}.{n}", f"{fl}.{n}")
    put_attn(f"{md}.transformer.final_attn_token_to_image",
             f"{fd}.transformer.final_attn_token_to_image")
    put_ln(f"{md}.transformer.norm_final_attn",
           f"{fd}.transformer.norm_final_attn")
    params[f"{fd}.upscale_conv1.kernel"] = _convtranspose_w(
        np.asarray(sd[f"{md}.output_upscaling.0.weight"]))
    params[f"{fd}.upscale_conv1.bias"] = np.asarray(
        sd[f"{md}.output_upscaling.0.bias"])
    put_ln(f"{md}.output_upscaling.1", f"{fd}.upscale_ln",
           scale_name="weight")
    params[f"{fd}.upscale_conv2.kernel"] = _convtranspose_w(
        np.asarray(sd[f"{md}.output_upscaling.3.weight"]))
    params[f"{fd}.upscale_conv2.bias"] = np.asarray(
        sd[f"{md}.output_upscaling.3.bias"])
    n_hyper = 1 + max(int(k.split(".")[2]) for k in sd
                      if k.startswith(f"{md}.output_hypernetworks_mlps."))
    for i in range(n_hyper):
        put_mlp(f"{md}.output_hypernetworks_mlps.{i}", f"{fd}.hyper_mlp_{i}")
    put_mlp(f"{md}.iou_prediction_head", f"{fd}.iou_prediction_head")
    return params, constants


def _convtranspose_w(w):
    # torch ConvTranspose2d [in, out, kh, kw] -> flax ConvTranspose
    # [kh, kw, in, out]; flax's lax.conv_transpose does NOT flip the
    # kernel while torch's gradient-of-conv semantics do, so flip the
    # spatial taps (verified numerically, tests/test_torch_parity.py)
    return np.ascontiguousarray(
        np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


def convert_sam2_state_dict(sd, head_dim_padding=0):
    """Full reference SAM2 video checkpoint -> this framework's SAM2Video
    tree: image encoder (via convert_sam2_encoder_state_dict) + prompt
    encoder + mask decoder + memory attention + memory encoder + object
    pointer heads + top-level embeddings.

    Reference converter analogue: SimpleAICV/video_interactive_
    segmentation/weight_convert/sam2.1_weight_convert_from_pytorch_
    offical_weight.py; source naming per
    .../models/segment_anything2/sam2video_train.py:50-190.

    Returns (params_flat, constants_flat) — constants_flat carries the
    prompt encoder's fixed gaussian PE matrix ('constants' collection).
    The only reference leaf skipped is no_memory_position_encoder,
    which is initialized but never read in the reference forward.
    """
    params, constants = {}, {}
    enc_params, _ = convert_sam2_encoder_state_dict(
        sd, head_dim_padding=head_dim_padding)
    for k, v in enc_params.items():
        params[f"image_encoder.{k}"] = v

    def put_linear(tp, fp):
        params[f"{fp}.kernel"] = _linear_w(np.asarray(sd[f"{tp}.weight"]))
        if f"{tp}.bias" in sd:
            params[f"{fp}.bias"] = np.asarray(sd[f"{tp}.bias"])

    def put_ln(tp, fp, scale_name="scale"):
        params[f"{fp}.{scale_name}"] = np.asarray(sd[f"{tp}.weight"])
        params[f"{fp}.bias"] = np.asarray(sd[f"{tp}.bias"])

    def put_conv(tp, fp):
        params[f"{fp}.kernel"] = _conv_w(np.asarray(sd[f"{tp}.weight"]))
        params[f"{fp}.bias"] = np.asarray(sd[f"{tp}.bias"])

    def put_mlp(tp, fp, n=3):
        for j in range(n):
            put_linear(f"{tp}.layers.{j}", f"{fp}.layer_{j}")

    def put_attn(tp, fp):
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            put_linear(f"{tp}.{proj}", f"{fp}.{proj}")

    # ---- top-level embeddings
    params["mask_memory_time_position_encoder"] = np.asarray(
        sd["mask_memory_time_position_encoder"]).reshape(
            sd["mask_memory_time_position_encoder"].shape[0], -1)
    params["no_memory_embedding"] = np.asarray(
        sd["no_memory_embedding"]).reshape(1, -1)
    params["no_object_pointer"] = np.asarray(sd["no_object_pointer"])
    params["no_object_embedding_spatial"] = np.asarray(
        sd["no_object_embedding_spatial"])
    put_mlp("object_pointer_projection", "object_pointer_projection")
    put_linear("object_pointer_time_position_projection",
               "object_pointer_time_position_projection")
    if "mask_downsample.weight" in sd:  # mask-as-prompt tracking conv
        params["mask_downsample_kernel"] = _conv_w(
            np.asarray(sd["mask_downsample.weight"]))
        params["mask_downsample_bias"] = np.asarray(
            sd["mask_downsample.bias"])

    # ---- prompt encoder
    constants["prompt_encoder.pe_layer."
              "positional_encoding_gaussian_matrix"] = np.asarray(
        sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"])
    params["prompt_encoder.point_embeddings"] = np.concatenate(
        [np.asarray(sd[f"prompt_encoder.point_embeddings.{i}.weight"])
         for i in range(4)], axis=0)
    params["prompt_encoder.not_a_point_embed"] = np.asarray(
        sd["prompt_encoder.not_a_point_embed.weight"])
    params["prompt_encoder.no_mask_embed"] = np.asarray(
        sd["prompt_encoder.no_mask_embed.weight"])
    put_conv("prompt_encoder.mask_downscaling.0",
             "prompt_encoder.mask_conv1")
    put_ln("prompt_encoder.mask_downscaling.1",
           "prompt_encoder.mask_ln1", scale_name="weight")
    put_conv("prompt_encoder.mask_downscaling.3",
             "prompt_encoder.mask_conv2")
    put_ln("prompt_encoder.mask_downscaling.4",
           "prompt_encoder.mask_ln2", scale_name="weight")
    put_conv("prompt_encoder.mask_downscaling.6",
             "prompt_encoder.mask_conv3")

    # ---- mask decoder
    md, fd = "mask_decoder", "mask_decoder"
    for tok in ("iou_token", "mask_tokens", "obj_score_token"):
        params[f"{fd}.{tok}"] = np.asarray(sd[f"{md}.{tok}.weight"])
    for sk in ("conv_s0", "conv_s1"):  # high-res skip projections
        if f"{md}.{sk}.weight" in sd:
            put_conv(f"{md}.{sk}", f"{fd}.{sk}")
    for i in range(2):
        tl, fl = f"{md}.transformer.layers.{i}", \
            f"{fd}.transformer.layer_{i}"
        put_attn(f"{tl}.self_attn", f"{fl}.self_attn")
        put_attn(f"{tl}.cross_attn_token_to_image",
                 f"{fl}.cross_attn_token_to_image")
        put_attn(f"{tl}.cross_attn_image_to_token",
                 f"{fl}.cross_attn_image_to_token")
        put_linear(f"{tl}.mlp.layers.0", f"{fl}.mlp_lin1")
        put_linear(f"{tl}.mlp.layers.1", f"{fl}.mlp_lin2")
        for n in ("norm1", "norm2", "norm3", "norm4"):
            put_ln(f"{tl}.{n}", f"{fl}.{n}")
    put_attn(f"{md}.transformer.final_attn_token_to_image",
             f"{fd}.transformer.final_attn_token_to_image")
    put_ln(f"{md}.transformer.norm_final_attn",
           f"{fd}.transformer.norm_final_attn")
    params[f"{fd}.upscale_conv1.kernel"] = _convtranspose_w(
        np.asarray(sd[f"{md}.output_upscaling.0.weight"]))
    params[f"{fd}.upscale_conv1.bias"] = np.asarray(
        sd[f"{md}.output_upscaling.0.bias"])
    put_ln(f"{md}.output_upscaling.1", f"{fd}.upscale_ln",
           scale_name="weight")
    params[f"{fd}.upscale_conv2.kernel"] = _convtranspose_w(
        np.asarray(sd[f"{md}.output_upscaling.3.weight"]))
    params[f"{fd}.upscale_conv2.bias"] = np.asarray(
        sd[f"{md}.output_upscaling.3.bias"])
    n_hyper = 1 + max(int(k.split(".")[2]) for k in sd
                      if k.startswith(f"{md}.output_hypernetworks_mlps."))
    for i in range(n_hyper):
        put_mlp(f"{md}.output_hypernetworks_mlps.{i}", f"{fd}.hyper_mlp_{i}")
    put_mlp(f"{md}.iou_prediction_head", f"{fd}.iou_prediction_head")
    put_mlp(f"{md}.pred_obj_score_head", f"{fd}.pred_obj_score_head")

    # ---- memory attention
    n_mem_layers = 1 + max(int(k.split(".")[2]) for k in sd
                           if k.startswith("memory_attention.layers."))
    for i in range(n_mem_layers):
        tl, fl = f"memory_attention.layers.{i}", \
            f"memory_attention.layer_{i}"
        put_attn(f"{tl}.self_attn", f"{fl}.self_attn")
        put_attn(f"{tl}.cross_attn_image", f"{fl}.cross_attn_image")
        put_linear(f"{tl}.linear1", f"{fl}.linear1")
        put_linear(f"{tl}.linear2", f"{fl}.linear2")
        for n in ("norm1", "norm2", "norm3"):
            put_ln(f"{tl}.{n}", f"{fl}.{n}")
    put_ln("memory_attention.norm", "memory_attention.norm")

    # ---- memory encoder
    me, fe = "memory_encoder", "memory_encoder"
    for tc, fc in ((0, 0), (3, 1), (6, 2), (9, 3)):
        put_conv(f"{me}.mask_downsampler.encoder.{tc}",
                 f"{fe}.mask_down_{fc}")
        put_ln(f"{me}.mask_downsampler.encoder.{tc + 1}",
               f"{fe}.mask_down_ln_{fc}")
    put_conv(f"{me}.mask_downsampler.encoder.12", f"{fe}.mask_down_out")
    put_conv(f"{me}.pix_feat_proj", f"{fe}.pix_feat_proj")
    n_fuser = 1 + max(int(k.split(".")[3]) for k in sd
                      if k.startswith(f"{me}.fuser.layers."))
    for i in range(n_fuser):
        tl, fl = f"{me}.fuser.layers.{i}", f"{fe}.fuser_{i}"
        params[f"{fl}.gamma"] = np.asarray(sd[f"{tl}.gamma"])
        params[f"{fl}.dwconv.kernel"] = _dw_conv_w(
            np.asarray(sd[f"{tl}.dwconv.weight"]))
        params[f"{fl}.dwconv.bias"] = np.asarray(sd[f"{tl}.dwconv.bias"])
        put_ln(f"{tl}.norm", f"{fl}.norm")
        put_linear(f"{tl}.pwconv1", f"{fl}.pwconv1")
        put_linear(f"{tl}.pwconv2", f"{fl}.pwconv2")
    put_conv(f"{me}.out_proj", f"{fe}.out_proj")
    return params, constants


def _convert_backbone(sd):
    """Dispatch a backbone sub-dict to the right family converter by key
    signature (the reference's detection/dense-prediction backbones reuse
    the classification module naming minus the fc head)."""
    if any(k.startswith("patch_embed1.") for k in sd):
        return convert_van_state_dict(sd)
    if any(k.startswith("downsample_layers.") and ".conv." in k
           for k in sd):
        return convert_convformer_state_dict(sd)
    if any(k.startswith("downsample_layers.") for k in sd):
        return convert_dinov3_convnext_state_dict(sd)
    if any(k.startswith("conv1.layer") for k in sd):
        return convert_resnet_state_dict(sd)
    return convert_dinov3_vit_state_dict(sd)


def convert_pfan_state_dict(sd, head="semantic"):
    """Reference PFAN dense-prediction family -> this framework's
    models/pfan.py trees. Covers all four reference head layouts:

    - head="semantic": PFANSemanticSegmentation
      (/root/reference/SimpleAICV/semantic_segmentation/models/
      pfan_semantic_segmentation.py:155-320; face/human parsing reuse the
      same module with different class counts)
    - head="sod": PFANSegmentation (salient_object_detection/models/
      pfan_segmentation.py, identical layout, 1-ch pred)
    - head="matting": PFANMatting (human_matting/models/pfan_matting.py:
      158-352 — global_*/local_* twin decoders + twin pred convs)

    Torch naming: {prefix}high_level_cpfe_{3,4}.{conv_1_1,conv_dil_*,conv},
    {prefix}{high,low}_level_conv*, {prefix}reduce_conv1,
    {prefix}upsample_conv{1,2,3}, {prefix}pred_conv; ConvBnActBlock packs
    conv/bn as .layer.{0,1}, ConvTransposeBnActBlock likewise. Flax
    naming: the same component names under decoder./global_decoder./
    local_decoder. scopes (models/pfan.py::PFANDecoder).
    """
    params, stats = {}, {}
    backbone_sd = {k[len("backbone."):]: v for k, v in sd.items()
                   if k.startswith("backbone.")}
    bp, bs = _convert_backbone(backbone_sd)
    params.update({f"backbone.{k}": v for k, v in bp.items()})
    stats.update({f"backbone.{k}": v for k, v in bs.items()})

    def put_convbn(tp, fp):
        params[f"{fp}.conv.kernel"] = _conv_w(
            np.asarray(sd[f"{tp}.layer.0.weight"]))
        params[f"{fp}.bn.scale"] = np.asarray(sd[f"{tp}.layer.1.weight"])
        params[f"{fp}.bn.bias"] = np.asarray(sd[f"{tp}.layer.1.bias"])
        stats[f"{fp}.bn.mean"] = np.asarray(
            sd[f"{tp}.layer.1.running_mean"])
        stats[f"{fp}.bn.var"] = np.asarray(
            sd[f"{tp}.layer.1.running_var"])

    def put_deconvbn(tp, fp):
        params[f"{fp}.deconv.kernel"] = _convtranspose_w(
            np.asarray(sd[f"{tp}.layer.0.weight"]))
        params[f"{fp}.bn.scale"] = np.asarray(sd[f"{tp}.layer.1.weight"])
        params[f"{fp}.bn.bias"] = np.asarray(sd[f"{tp}.layer.1.bias"])
        stats[f"{fp}.bn.mean"] = np.asarray(
            sd[f"{tp}.layer.1.running_mean"])
        stats[f"{fp}.bn.var"] = np.asarray(
            sd[f"{tp}.layer.1.running_var"])

    def put_cpfe(tp, fp):
        params[f"{fp}.conv_1_1.kernel"] = _conv_w(
            np.asarray(sd[f"{tp}.conv_1_1.weight"]))
        for d in (3, 5, 7):
            params[f"{fp}.conv_dil_{d}.kernel"] = _conv_w(
                np.asarray(sd[f"{tp}.conv_dil_{d}.weight"]))
        put_convbn(f"{tp}.conv", f"{fp}.conv")

    def put_decoder(tprefix, fprefix):
        put_cpfe(f"{tprefix}high_level_cpfe_3",
                 f"{fprefix}.high_level_cpfe_3")
        put_cpfe(f"{tprefix}high_level_cpfe_4",
                 f"{fprefix}.high_level_cpfe_4")
        for name in ("high_level_conv", "low_level_conv_1",
                     "low_level_conv_2", "low_level_conv", "reduce_conv1",
                     "upsample_conv2"):
            put_convbn(f"{tprefix}{name}", f"{fprefix}.{name}")
        put_deconvbn(f"{tprefix}upsample_conv1",
                     f"{fprefix}.upsample_conv1")
        put_deconvbn(f"{tprefix}upsample_conv3",
                     f"{fprefix}.upsample_conv3")

    def put_pred(tp, fp):
        params[f"{fp}.kernel"] = _conv_w(np.asarray(sd[f"{tp}.weight"]))
        params[f"{fp}.bias"] = np.asarray(sd[f"{tp}.bias"])

    if head == "matting":
        put_decoder("global_", "global_decoder")
        put_decoder("local_", "local_decoder")
        put_pred("global_pred_conv", "global_pred_conv")
        put_pred("local_pred_conv", "local_pred_conv")
    else:
        put_decoder("", "decoder")
        put_pred("pred_conv", "pred_conv")
    return params, stats


def convert_dbnet_state_dict(sd):
    """Reference DBNet (text_detection/models/{dbnet,fpn,head}.py naming:
    backbone.*, fpn.{c2..c5,p2..p4,last}_conv.layer.{0,1},
    head.{binary,thresh}_conv.{0,1,2} = ConvBnActBlock /
    ConvTransposeBnActBlock / bare ConvTranspose2d) -> this framework's
    DBNet (text_detection/models.py: fpn.*.{conv,bn},
    head.{binary,thresh}_{conv,up1,up2})."""
    params, stats = {}, {}
    backbone_sd = {k[len("backbone."):]: v for k, v in sd.items()
                   if k.startswith("backbone.")}
    bp, bs = _convert_backbone(backbone_sd)
    params.update({f"backbone.{k}": v for k, v in bp.items()})
    stats.update({f"backbone.{k}": v for k, v in bs.items()})

    def put_convbn(tp, fp):
        params[f"{fp}.conv.kernel"] = _conv_w(
            np.asarray(sd[f"{tp}.layer.0.weight"]))
        params[f"{fp}.bn.scale"] = np.asarray(sd[f"{tp}.layer.1.weight"])
        params[f"{fp}.bn.bias"] = np.asarray(sd[f"{tp}.layer.1.bias"])
        stats[f"{fp}.bn.mean"] = np.asarray(
            sd[f"{tp}.layer.1.running_mean"])
        stats[f"{fp}.bn.var"] = np.asarray(
            sd[f"{tp}.layer.1.running_var"])

    for name in ("c2_conv", "c3_conv", "c4_conv", "c5_conv", "p2_conv",
                 "p3_conv", "p4_conv", "last_conv"):
        put_convbn(f"fpn.{name}", f"fpn.{name}")
    for branch in ("binary", "thresh"):
        put_convbn(f"head.{branch}_conv.0", f"head.{branch}_conv")
        params[f"head.{branch}_up1.deconv.kernel"] = _convtranspose_w(
            np.asarray(sd[f"head.{branch}_conv.1.layer.0.weight"]))
        params[f"head.{branch}_up1.bn.scale"] = np.asarray(
            sd[f"head.{branch}_conv.1.layer.1.weight"])
        params[f"head.{branch}_up1.bn.bias"] = np.asarray(
            sd[f"head.{branch}_conv.1.layer.1.bias"])
        stats[f"head.{branch}_up1.bn.mean"] = np.asarray(
            sd[f"head.{branch}_conv.1.layer.1.running_mean"])
        stats[f"head.{branch}_up1.bn.var"] = np.asarray(
            sd[f"head.{branch}_conv.1.layer.1.running_var"])
        params[f"head.{branch}_up2.kernel"] = _convtranspose_w(
            np.asarray(sd[f"head.{branch}_conv.2.weight"]))
        params[f"head.{branch}_up2.bias"] = np.asarray(
            sd[f"head.{branch}_conv.2.bias"])
    return params, stats


def _put_lstm_direction(sd, params, tp, suffix, fp):
    """One torch nn.LSTM direction -> flax OptimizedLSTMCell leaves.

    torch packs gates as 4H rows in (i, f, g, o) order with two bias
    vectors that are summed at runtime; flax keeps per-gate Dense layers
    (input kernels ii/if/ig/io without bias, hidden kernels+bias
    hi/hf/hg/ho) — the summed torch bias lands on the hidden Dense."""
    w_ih = np.asarray(sd[f"{tp}.weight_ih_l0{suffix}"])
    w_hh = np.asarray(sd[f"{tp}.weight_hh_l0{suffix}"])
    b = (np.asarray(sd[f"{tp}.bias_ih_l0{suffix}"])
         + np.asarray(sd[f"{tp}.bias_hh_l0{suffix}"]))
    h = w_hh.shape[1]
    for gi, g in enumerate("ifgo"):
        params[f"{fp}.i{g}.kernel"] = _linear_w(
            w_ih[gi * h:(gi + 1) * h])
        params[f"{fp}.h{g}.kernel"] = _linear_w(
            w_hh[gi * h:(gi + 1) * h])
        params[f"{fp}.h{g}.bias"] = b[gi * h:(gi + 1) * h]


def convert_ctc_state_dict(sd):
    """Reference CTCModel (text_recognition/models/{ctc_model,encoder,
    predictor}.py naming: backbone.* OCR resnet, encoder.linear{0,1,2} +
    encoder.rnn{1,2} bidirectional LSTMs, predictor.linear{1,2}) -> this
    framework's CTCModel (text_recognition/models/ctc_model.py)."""
    params, stats = {}, {}
    backbone_sd = {k[len("backbone."):]: v for k, v in sd.items()
                   if k.startswith("backbone.")}
    bp, bs = _convert_backbone(backbone_sd)
    params.update({f"backbone.{k}": v for k, v in bp.items()})
    stats.update({f"backbone.{k}": v for k, v in bs.items()})

    def put_linear(tp, fp):
        params[f"{fp}.kernel"] = _linear_w(np.asarray(sd[f"{tp}.weight"]))
        params[f"{fp}.bias"] = np.asarray(sd[f"{tp}.bias"])

    for i in (0, 1, 2):
        put_linear(f"encoder.linear{i}", f"encoder.linear{i}")
    for rnn in ("rnn1", "rnn2"):
        _put_lstm_direction(sd, params, f"encoder.{rnn}", "",
                            f"encoder.{rnn}.fwd_cell")
        _put_lstm_direction(sd, params, f"encoder.{rnn}", "_reverse",
                            f"encoder.{rnn}.bwd_cell")
    put_linear("predictor.linear1", "predictor.linear1")
    put_linear("predictor.linear2", "predictor.linear2")
    return params, stats


def convert_solov2_state_dict(sd):
    """Reference SOLOV2 (instance_segmentation/models/solov2.py naming:
    backbone.*, fpn.{lateral,fpn}_conv_layers.{i}, mask_feature_head.
    level_{j}_conv{k}.{conv,gn} + pred_conv, bbox_head.{cate,kernel}_
    conv_layers.{i}.{conv,gn} + {cate,kernel}_pred_conv) -> this
    framework's SOLOV2 (instance_segmentation/models/solov2.py:
    fpn.lateral_{i}/fpn_{i}, mask_feature_head.level_*_conv*.{conv,gn},
    bbox_head.{cate,kernel}_conv_{i} + *_pred_conv)."""
    params, stats = {}, {}
    backbone_sd = {k[len("backbone."):]: v for k, v in sd.items()
                   if k.startswith("backbone.")}
    bp, bs = _convert_backbone(backbone_sd)
    params.update({f"backbone.{k}": v for k, v in bp.items()})
    stats.update({f"backbone.{k}": v for k, v in bs.items()})

    def put_conv(tp, fp):
        params[f"{fp}.kernel"] = _conv_w(np.asarray(sd[f"{tp}.weight"]))
        if f"{tp}.bias" in sd:
            params[f"{fp}.bias"] = np.asarray(sd[f"{tp}.bias"])

    def put_convgn(tp, fp):
        put_conv(f"{tp}.conv", f"{fp}.conv")
        params[f"{fp}.gn.scale"] = np.asarray(sd[f"{tp}.gn.weight"])
        params[f"{fp}.gn.bias"] = np.asarray(sd[f"{tp}.gn.bias"])

    n_lat = 1 + max(int(k.split(".")[2]) for k in sd
                    if k.startswith("fpn.lateral_conv_layers."))
    for i in range(n_lat):
        put_conv(f"fpn.lateral_conv_layers.{i}", f"fpn.lateral_{i}")
        put_conv(f"fpn.fpn_conv_layers.{i}", f"fpn.fpn_{i}")
    mh = "mask_feature_head"
    for name in ("level_0_conv1", "level_1_conv1", "level_2_conv1",
                 "level_2_conv2", "level_3_conv1", "level_3_conv2",
                 "level_3_conv3", "pred_conv"):
        put_convgn(f"{mh}.{name}", f"{mh}.{name}")
    bh = "bbox_head"
    n_stack = 1 + max(int(k.split(".")[2]) for k in sd
                      if k.startswith(f"{bh}.cate_conv_layers."))
    for i in range(n_stack):
        put_convgn(f"{bh}.cate_conv_layers.{i}", f"{bh}.cate_conv_{i}")
        put_convgn(f"{bh}.kernel_conv_layers.{i}", f"{bh}.kernel_conv_{i}")
    put_conv(f"{bh}.cate_pred_conv", f"{bh}.cate_pred_conv")
    put_conv(f"{bh}.kernel_pred_conv", f"{bh}.kernel_pred_conv")
    return params, stats


def convert_yolact_state_dict(sd):
    """Reference YOLACT (instance_segmentation/models/yolact.py naming:
    backbone.*, fpn.lat_layer_p{3,4,5} / pred_layers_p{3,4,5}.0 /
    downsample_layers_p{6,7}.0, proto_net.proto_layers1.{0,2,4} +
    proto_layers2.{0,2}, head.conv1.0 / {bbox,conf}_pred_conv /
    coef_pred_conv.0, semantic_seg_conv) -> this framework's YOLACT
    (fpn.lat_p*/pred_p*/down_p*, proto_net.proto1_{0,1,2}/proto2_{0,1},
    head.conv1/box/conf/coef, semantic_seg_conv)."""
    params, stats = {}, {}
    backbone_sd = {k[len("backbone."):]: v for k, v in sd.items()
                   if k.startswith("backbone.")}
    bp, bs = _convert_backbone(backbone_sd)
    params.update({f"backbone.{k}": v for k, v in bp.items()})
    stats.update({f"backbone.{k}": v for k, v in bs.items()})

    def put_conv(tp, fp):
        params[f"{fp}.kernel"] = _conv_w(np.asarray(sd[f"{tp}.weight"]))
        if f"{tp}.bias" in sd:
            params[f"{fp}.bias"] = np.asarray(sd[f"{tp}.bias"])

    for lvl in (3, 4, 5):
        put_conv(f"fpn.lat_layer_p{lvl}", f"fpn.lat_p{lvl}")
        put_conv(f"fpn.pred_layers_p{lvl}.0", f"fpn.pred_p{lvl}")
    for lvl in (6, 7):
        put_conv(f"fpn.downsample_layers_p{lvl}.0", f"fpn.down_p{lvl}")
    for i, idx in enumerate((0, 2, 4)):
        put_conv(f"proto_net.proto_layers1.{idx}",
                 f"proto_net.proto1_{i}")
    for i, idx in enumerate((0, 2)):
        put_conv(f"proto_net.proto_layers2.{idx}",
                 f"proto_net.proto2_{i}")
    put_conv("head.conv1.0", "head.conv1")
    put_conv("head.bbox_pred_conv", "head.box")
    put_conv("head.conf_pred_conv", "head.conf")
    put_conv("head.coef_pred_conv.0", "head.coef")
    put_conv("semantic_seg_conv", "semantic_seg_conv")
    return params, stats


def convert_universal_segmentation_state_dict(sd):
    """Reference UniversalSegmentation / UniversalMatting
    (universal_segmentation/models/dinov3_universal_{segmentation,
    matting}.py naming: backbone.* DINOv3 ViT, query_embedding,
    class_pred, query_proj.{0,2,4}, {global_,local_,}upscale_blocks.{i}.
    {conv1 ConvTranspose2d, conv2 depthwise Conv2d, norm LayerNorm}) ->
    this framework's universal_segmentation/models.py (query_embedding,
    class_pred, query_proj_{0,1,2}, {global_,local_,}upscale_{i})."""
    params = {}
    backbone_sd = {k[len("backbone."):]: v for k, v in sd.items()
                   if k.startswith("backbone.")}
    bp, _ = convert_dinov3_vit_state_dict(backbone_sd)
    params.update({f"backbone.{k}": v for k, v in bp.items()})

    def put_linear(tp, fp):
        params[f"{fp}.kernel"] = _linear_w(np.asarray(sd[f"{tp}.weight"]))
        if f"{tp}.bias" in sd:
            params[f"{fp}.bias"] = np.asarray(sd[f"{tp}.bias"])

    params["query_embedding"] = np.asarray(sd["query_embedding.weight"])
    put_linear("class_pred", "class_pred")
    for i, idx in enumerate((0, 2, 4)):
        put_linear(f"query_proj.{idx}", f"query_proj_{i}")
    for tlist, fprefix in (("upscale_blocks", "upscale"),
                           ("global_upscale_blocks", "global_upscale"),
                           ("local_upscale_blocks", "local_upscale")):
        i = 0
        while f"{tlist}.{i}.conv1.weight" in sd:
            fb = f"{fprefix}_{i}"
            params[f"{fb}.conv1.kernel"] = _convtranspose_w(
                np.asarray(sd[f"{tlist}.{i}.conv1.weight"]))
            params[f"{fb}.conv1.bias"] = np.asarray(
                sd[f"{tlist}.{i}.conv1.bias"])
            params[f"{fb}.conv2.kernel"] = _dw_conv_w(
                np.asarray(sd[f"{tlist}.{i}.conv2.weight"]))
            params[f"{fb}.norm.scale"] = np.asarray(
                sd[f"{tlist}.{i}.norm.weight"])
            params[f"{fb}.norm.bias"] = np.asarray(
                sd[f"{tlist}.{i}.norm.bias"])
            i += 1
    return params, {}


def convert_retinanet_state_dict(sd):
    """Reference full-detector RetinaNet (detection/models/retinanet.py:27-91
    naming: backbone.*, fpn.P{3,4,5}_{1,2}/P6/P7.1, cls_head.cls_head.{2i}/
    cls_out, reg_head.reg_head.{2i}/reg_out) -> this framework's RetinaNet
    flat (params, batch_stats) dotted dicts, so published reference
    checkpoints can drive the pinned COCO AP protocol end-to-end."""
    params, stats = {}, {}
    backbone_sd = {k[len("backbone."):]: v for k, v in sd.items()
                   if k.startswith("backbone.")}
    b_params, b_stats = convert_resnet_state_dict(backbone_sd)
    params.update({f"backbone.{k}": v for k, v in b_params.items()})
    stats.update({f"backbone.{k}": v for k, v in b_stats.items()})

    def put_conv(tname, fname):
        params[f"{fname}.kernel"] = _conv_w(np.asarray(sd[f"{tname}.weight"]))
        if f"{tname}.bias" in sd:
            params[f"{fname}.bias"] = np.asarray(sd[f"{tname}.bias"])

    for lvl in (3, 4, 5):
        put_conv(f"fpn.P{lvl}_1", f"fpn.P{lvl}_1")
        put_conv(f"fpn.P{lvl}_2", f"fpn.P{lvl}_2")
    put_conv("fpn.P6", "fpn.P6")
    put_conv("fpn.P7.1", "fpn.P7")  # Sequential(ReLU, Conv) -> index 1
    for head in ("cls", "reg"):
        for i in range(4):  # Sequential interleaves ReLU: conv at 2i
            put_conv(f"{head}_head.{head}_head.{2 * i}",
                     f"{head}_head.conv{i}")
        put_conv(f"{head}_head.{head}_out", f"{head}_head.{head}_out")
    return params, stats


def convert_fcos_state_dict(sd):
    """Reference FCOS (detection/models/fcos.py:27-90 naming: backbone.*,
    fpn.* (use_p5=True), clsregcnt_head.{cls,reg}_head.{3i,3i+1} conv+GN
    towers, cls_out/reg_out/center_out, scales) -> flat dicts for this
    framework's FCOS."""
    params, stats = {}, {}
    backbone_sd = {k[len("backbone."):]: v for k, v in sd.items()
                   if k.startswith("backbone.")}
    b_params, b_stats = convert_resnet_state_dict(backbone_sd)
    params.update({f"backbone.{k}": v for k, v in b_params.items()})
    stats.update({f"backbone.{k}": v for k, v in b_stats.items()})

    def put_conv(tname, fname):
        params[f"{fname}.kernel"] = _conv_w(np.asarray(sd[f"{tname}.weight"]))
        if f"{tname}.bias" in sd:
            params[f"{fname}.bias"] = np.asarray(sd[f"{tname}.bias"])

    for lvl in (3, 4, 5):
        put_conv(f"fpn.P{lvl}_1", f"fpn.P{lvl}_1")
        put_conv(f"fpn.P{lvl}_2", f"fpn.P{lvl}_2")
    put_conv("fpn.P6", "fpn.P6")
    put_conv("fpn.P7.1", "fpn.P7")
    h = "clsregcnt_head"
    for tower in ("cls", "reg"):
        for i in range(4):  # conv at 3i, GroupNorm at 3i+1, ReLU at 3i+2
            put_conv(f"{h}.{tower}_head.{3 * i}", f"{h}.{tower}_conv{i}")
            params[f"{h}.{tower}_gn{i}.scale"] = np.asarray(
                sd[f"{h}.{tower}_head.{3 * i + 1}.weight"])
            params[f"{h}.{tower}_gn{i}.bias"] = np.asarray(
                sd[f"{h}.{tower}_head.{3 * i + 1}.bias"])
    put_conv(f"{h}.cls_out", f"{h}.cls_out")
    put_conv(f"{h}.reg_out", f"{h}.reg_out")
    put_conv(f"{h}.center_out", f"{h}.center_out")
    params["scales"] = np.asarray(sd["scales"])
    return params, stats
