"""SAM matting prediction example (human matting / salient object).

Covers /root/reference/13.interactive_segmentation_training/
sam_predict_example/sam_b_matting_human_matting_predict_example_train.ipynb
and sam_b_matting_salient_object_detection_predict_example_train.ipynb:
prompt the SAM matting twin with a click or box and save the fused alpha
matte plus the composited cut-out.

Usage:
  python sam_matting_predict_example.py --synthetic
  python sam_matting_predict_example.py --image person.jpg \
      --point 320,200 [--box x0,y0,x1,y1] [--checkpoint ckpt]
"""

import argparse

import numpy as np

from _example_common import (build_sam, load_or_synthesize_image,
                             prep_canvas)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image", default="")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--network", default="sam_b_matting")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--point", default="320,320")
    p.add_argument("--box", default=None)
    p.add_argument("--save", default="sam_matting_alpha.png")
    args = p.parse_args()

    import cv2
    import jax.numpy as jnp

    image = load_or_synthesize_image(None if args.synthetic else args.image)
    h, w = image.shape[:2]
    from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation import (
        models as sam_models)
    resize = sam_models.__dict__[args.network]().image_size
    canvas, factor, (rh, rw) = prep_canvas(image, resize)

    pts = np.full((1, 1, 3), -1.0, np.float32)
    if args.point:
        x, y = [float(v) for v in args.point.split(",")]
        pts[0, 0] = [x * factor, y * factor, 1.0]
    prompts = {
        "prompt_point": jnp.asarray(pts),
        "prompt_box": None,
        "prompt_box_valid": None,
        "prompt_mask": None,
    }
    if args.box:
        prompts["prompt_box"] = jnp.asarray(
            [[float(v) * factor for v in args.box.split(",")]], jnp.float32)
        prompts["prompt_box_valid"] = jnp.ones((1,), jnp.float32)

    model, params, variables = build_sam(args.network, args.checkpoint,
                                         canvas, prompts)
    embedding = model.apply(
        {"params": params, **variables}, jnp.asarray(canvas[None]),
        method=type(model).forward_image_encoder)
    out = model.apply(
        {"params": params, **variables}, embedding, prompts,
        method=type(model).forward_prompt_encoder_mask_decoder)
    # matting head outputs: (global trimap, local alpha, fused alpha, ...)
    fused = np.asarray(out[2])[0, :rh, :rw]
    fused = fused[..., 0] if fused.ndim == 3 else fused
    alpha = np.clip(cv2.resize(fused, (w, h)), 0.0, 1.0)
    cv2.imwrite(args.save, (alpha * 255).astype(np.uint8))
    cutout = (image * alpha[..., None]).astype(np.uint8)
    cv2.imwrite(args.save.replace(".png", "_cutout.png"),
                cv2.cvtColor(cutout, cv2.COLOR_RGB2BGR))
    print("alpha range:", float(alpha.min()), float(alpha.max()))
    print("saved", args.save)


if __name__ == "__main__":
    main()
