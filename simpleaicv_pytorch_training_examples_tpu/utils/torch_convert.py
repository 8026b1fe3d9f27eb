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
