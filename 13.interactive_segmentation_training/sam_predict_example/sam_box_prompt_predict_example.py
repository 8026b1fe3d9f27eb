"""SAM box-prompt prediction example.

Covers /root/reference/13.interactive_segmentation_training/
sam_predict_example/sam_b_predict_example.ipynb (box-prompt cells) as a
runnable script: encode once, decode with a box prompt, save the best
mask overlay.

Usage:
  python sam_box_prompt_predict_example.py --synthetic
  python sam_box_prompt_predict_example.py --image img.jpg \
      --box 100,100,500,500 [--checkpoint ckpt] [--network sam_b]
"""

import argparse

import numpy as np

from _example_common import (build_sam, load_or_synthesize_image,
                             overlay_mask, prep_canvas)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image", default="")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--network", default="sam_b")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--box", default="192,192,448,448", help="x0,y0,x1,y1")
    p.add_argument("--save", default="sam_box_out.png")
    args = p.parse_args()

    import cv2
    import jax.numpy as jnp

    image = load_or_synthesize_image(None if args.synthetic else args.image)
    h, w = image.shape[:2]

    # model defaults first so we can scale the prompt into canvas coords
    from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation import (
        models as sam_models)
    resize = sam_models.__dict__[args.network]().image_size
    canvas, factor, (rh, rw) = prep_canvas(image, resize)

    box = np.asarray([[float(v) * factor for v in args.box.split(",")]],
                     np.float32)
    prompts = {
        "prompt_point": jnp.full((1, 1, 3), -1.0, jnp.float32),
        "prompt_box": jnp.asarray(box),
        "prompt_box_valid": jnp.ones((1,), jnp.float32),
        "prompt_mask": None,
    }
    model, params, variables = build_sam(args.network, args.checkpoint,
                                         canvas, prompts)
    embedding = model.apply(
        {"params": params, **variables}, jnp.asarray(canvas[None]),
        method=type(model).forward_image_encoder)
    masks, ious = model.apply(
        {"params": params, **variables}, embedding, prompts,
        method=type(model).forward_prompt_encoder_mask_decoder)[:2]
    masks, ious = np.asarray(masks)[0], np.asarray(ious)[0]
    best = masks[ious.argmax(), :rh, :rw] > 0
    best = cv2.resize(best.astype(np.uint8), (w, h),
                      interpolation=cv2.INTER_NEAREST)
    cv2.imwrite(args.save, overlay_mask(image, best))
    print("predicted ious:", [round(float(v), 3) for v in ious])
    print("saved", args.save)


if __name__ == "__main__":
    main()
