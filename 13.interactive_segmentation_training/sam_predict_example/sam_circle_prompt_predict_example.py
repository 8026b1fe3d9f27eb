"""SAM circle-prompt prediction example.

Covers the reference's circle-prompt UI flow (gradio_demo/13.0.1 circle
prompt + the sam_b predict notebooks): a (cx, cy, r) circle becomes a
positive center click + the circle's bounding box, mirroring how the
reference converts circle gestures into SAM prompts.

Usage:
  python sam_circle_prompt_predict_example.py --synthetic
  python sam_circle_prompt_predict_example.py --image img.jpg \
      --circle 320,320,130 [--checkpoint ckpt] [--network sam_b]
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
    p.add_argument("--circle", default="320,320,130", help="cx,cy,r")
    p.add_argument("--save", default="sam_circle_out.png")
    args = p.parse_args()

    import cv2
    import jax.numpy as jnp

    image = load_or_synthesize_image(None if args.synthetic else args.image)
    h, w = image.shape[:2]
    from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation import (
        models as sam_models)
    resize = sam_models.__dict__[args.network]().image_size
    canvas, factor, (rh, rw) = prep_canvas(image, resize)

    cx, cy, r = [float(v) for v in args.circle.split(",")]
    # circle -> center click + bounding box (reference circle-UI mapping)
    pts = np.asarray([[[cx * factor, cy * factor, 1.0]]], np.float32)
    box = np.asarray([[(cx - r) * factor, (cy - r) * factor,
                       (cx + r) * factor, (cy + r) * factor]], np.float32)
    prompts = {
        "prompt_point": jnp.asarray(pts),
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
    vis = overlay_mask(image, best)
    cv2.circle(vis, (int(cx), int(cy)), int(r), (0, 0, 255), 2)
    cv2.imwrite(args.save, vis)
    print("predicted ious:", [round(float(v), 3) for v in ious])
    print("saved", args.save)


if __name__ == "__main__":
    main()
