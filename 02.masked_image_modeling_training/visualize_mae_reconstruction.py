"""MAE reconstruction visualization.

Parity with /root/reference/02.masked_image_modeling_training/.../
visualize.py: run a trained MAE on one image and save the
original / masked / reconstructed / paste-visible triptych.

Usage:
  python visualize_mae_reconstruction.py --image img.jpg \
      --checkpoint ckpt [--network vit_base_patch16_mae] [--mask-ratio .75]
"""

import argparse
import os
import sys

BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(BASE_DIR)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image", required=True)
    p.add_argument("--network",
                   default="vit_base_patch16_224_mae_pretrain_model")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--mask-ratio", type=float, default=0.75)
    p.add_argument("--save", default="mae_visualize.png")
    args = p.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from simpleaicv_pytorch_training_examples_tpu.classification.common import (
        load_state_dict)
    from simpleaicv_pytorch_training_examples_tpu.engine import (
        apply_pretrained, init_model)
    from simpleaicv_pytorch_training_examples_tpu.masked_image_modeling import (
        models as mae_models)

    model = mae_models.__dict__[args.network](mask_ratio=args.mask_ratio)
    size = 224
    patch = 16

    image = cv2.cvtColor(cv2.imread(args.image),
                         cv2.COLOR_BGR2RGB).astype(np.float32)
    image = cv2.resize(image, (size, size)) / 255.0
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    x = ((image - mean) / std)[None].astype(np.float32)

    load_state_dict(args.checkpoint, model)
    params, variables = init_model(model, (1, size, size, 3),
                                   jax.random.PRNGKey(0))
    params = apply_pretrained(model, params)

    preds, mask = model.apply(
        {"params": params, **variables}, jnp.asarray(x), train=False,
        rngs={"masking": jax.random.PRNGKey(1)})
    preds = np.asarray(preds)[0]   # [L, p*p*3] per-patch pixels
    mask = np.asarray(mask)[0]     # [L] 1 = masked

    n = size // patch

    def unpatchify(patches):
        img = patches.reshape(n, n, patch, patch, 3)
        return img.transpose(0, 2, 1, 3, 4).reshape(size, size, 3)

    recon = unpatchify(preds)
    # undo the per-patch normalization using the original patch stats
    orig_patches = image.reshape(n, patch, n, patch, 3).transpose(
        0, 2, 1, 3, 4).reshape(n * n, -1)
    mu = orig_patches.mean(axis=1, keepdims=True)
    sd = orig_patches.std(axis=1, keepdims=True) + 1e-6
    recon = unpatchify(preds * sd + mu)

    mask_img = unpatchify(np.repeat(mask[:, None], patch * patch * 3,
                                    axis=1))
    masked = image * (1 - mask_img)
    pasted = image * (1 - mask_img) + recon * mask_img

    row = np.concatenate([image, masked, np.clip(recon, 0, 1),
                          np.clip(pasted, 0, 1)], axis=1)
    cv2.imwrite(args.save,
                cv2.cvtColor((row * 255).astype(np.uint8),
                             cv2.COLOR_RGB2BGR))
    print(f"saved {args.save} (original | masked | recon | paste)")


if __name__ == "__main__":
    main()
