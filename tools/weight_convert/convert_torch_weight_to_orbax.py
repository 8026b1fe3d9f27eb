"""Convert official PyTorch checkpoints into this framework's orbax format.

Parity with /root/reference/SimpleAICV/classification/weight_convert/
{convert_resnet_weight_from_pytorch_offical_weight,
convert_vit_mae_weight_from_offical_mae_weight}.py (and the SAM/SAM2
weight_convert twins): load a torch state_dict, remap names + transpose
layouts (OIHW conv -> HWIO, [out,in] linear -> [in,out], BN -> flax
batch_stats), verify the tree matches a freshly-initialized flax model,
and save with orbax.

Usage:
  python convert_torch_weight_to_orbax.py --torch-ckpt resnet50.pth \
      --mapping resnet --network resnet50 --num-classes 1000 \
      --output ckpt_dir
  python convert_torch_weight_to_orbax.py --torch-ckpt mae_vit_b.pth \
      --mapping vit --network vit_base_patch16 --output ckpt_dir
  python convert_torch_weight_to_orbax.py --torch-ckpt sam_b.pth \
      --mapping sam --network sam_b --input-size 1024 --output ckpt_dir
  python convert_torch_weight_to_orbax.py --torch-ckpt sam2_b+.pth \
      --mapping sam2 --network sam2_hiera_base_plus_video \
      --input-size 1024 --output ckpt_dir
"""

import argparse
import os
import sys

BASE_DIR = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
sys.path.append(BASE_DIR)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--torch-ckpt", required=True)
    p.add_argument("--mapping", choices=("resnet", "vit", "sam", "sam2"),
                   required=True)
    p.add_argument("--network", required=True)
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--input-size", type=int, default=224)
    p.add_argument("--output", required=True)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from simpleaicv_pytorch_training_examples_tpu.engine import init_model
    from simpleaicv_pytorch_training_examples_tpu.models import backbones
    from simpleaicv_pytorch_training_examples_tpu.utils.checkpoint import (
        CheckpointStore, load_torch_state_dict)
    from simpleaicv_pytorch_training_examples_tpu.utils.torch_convert import (
        convert_resnet_state_dict, convert_sam2_state_dict,
        convert_sam_state_dict, convert_vit_state_dict, merge_converted)

    sd = load_torch_state_dict(args.torch_ckpt)
    if args.mapping == "sam":
        # full SAM (encoder + prompt encoder + two-way mask decoder)
        from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation.models.segment_anything import (
            sam as sam_models)
        params_flat, constants_flat = convert_sam_state_dict(sd)
        model = sam_models.__dict__[args.network](
            image_size=args.input_size)
        b = 1
        images = jnp.zeros((b, args.input_size, args.input_size, 3))
        prompts = {"prompt_point": jnp.zeros((b, 1, 3)),
                   "prompt_box": jnp.zeros((b, 4)),
                   "prompt_box_valid": jnp.zeros((b,)),
                   "prompt_mask": jnp.zeros(
                       (b, args.input_size // 4, args.input_size // 4, 1)),
                   "prompt_mask_valid": jnp.zeros((b,))}
        v = model.init({"params": jax.random.PRNGKey(0)}, images, prompts)
        params, _ = merge_converted(v["params"], {}, params_flat, {})
        constants, _ = merge_converted(v["constants"], {},
                                       constants_flat, {})
        variables = {"constants": constants}
    elif args.mapping == "sam2":
        # full SAM2 video model (encoder + prompt/mask decoder + memory)
        from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.models.segment_anything2 import (
            sam2 as sam2_models)
        params_flat, constants_flat = convert_sam2_state_dict(sd)
        model = sam2_models.__dict__[args.network](
            image_size=args.input_size, use_high_res_features=True)
        b = 1
        # 2-frame init: the tracked-frame path (memory attention, pointer
        # time projection, mask-prompt downsample) must be traced so the
        # converted checkpoint carries those params too
        images = jnp.zeros((b, 2, args.input_size, args.input_size, 3))
        prompts = {"prompt_point": jnp.zeros((b, 1, 3)),
                   "prompt_box": jnp.zeros((b, 4)),
                   "prompt_box_valid": jnp.zeros((b,)),
                   "prompt_mask": jnp.zeros(
                       (b, args.input_size // 4, args.input_size // 4, 1)),
                   "prompt_mask_valid": jnp.zeros((b,))}
        v = model.init({"params": jax.random.PRNGKey(0)}, images, prompts)
        params, _ = merge_converted(v["params"], {}, params_flat, {})
        constants, _ = merge_converted(v["constants"], {},
                                       constants_flat, {})
        variables = {"constants": constants}
    else:
        convert = {"resnet": convert_resnet_state_dict,
                   "vit": convert_vit_state_dict}[args.mapping]
        params_flat, batch_stats_flat = convert(sd)

        model = backbones.__dict__[args.network](
            num_classes=args.num_classes)
        params, variables = init_model(
            model, (1, args.input_size, args.input_size, 3),
            jax.random.PRNGKey(0))
        params, variables = merge_converted(params, variables.get(
            "batch_stats", {}), params_flat, batch_stats_flat)

    n = sum(np.prod(l.shape) for l in jax.tree.leaves(params))
    print(f"converted {n / 1e6:.2f} M params")
    store = CheckpointStore(args.output)
    # "best"-style checkpoint: a bare params(+batch_stats) tree, the
    # format apply_pretrained / *_pretrained_path consume
    tree = {"params": params}
    if variables:
        if args.mapping in ("sam", "sam2"):
            tree.update(variables)  # {"constants": ...}
        else:
            tree["batch_stats"] = variables
    store.save_best(tree)
    print(f"saved orbax checkpoint to {os.path.join(args.output, 'best')}")


if __name__ == "__main__":
    main()
