"""SAM multilevel prediction example: visualize ALL 4 mask outputs.

Covers /root/reference/13.interactive_segmentation_training/
sam_predict_example/sam_b_predict_example_multilevel_train.ipynb: one
click, all four multimask outputs saved side by side with their predicted
IoUs (the multilevel-trained checkpoints supervise every level).

Usage:
  python sam_multilevel_predict_example.py --synthetic
  python sam_multilevel_predict_example.py --image img.jpg --point 320,320
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
    p.add_argument("--point", default="320,320")
    p.add_argument("--save", default="sam_multilevel_out.png")
    args = p.parse_args()

    import cv2
    import jax.numpy as jnp

    image = load_or_synthesize_image(None if args.synthetic else args.image)
    h, w = image.shape[:2]
    from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation import (
        models as sam_models)
    resize = sam_models.__dict__[args.network]().image_size
    canvas, factor, (rh, rw) = prep_canvas(image, resize)

    x, y = [float(v) for v in args.point.split(",")]
    prompts = {
        "prompt_point": jnp.asarray([[[x * factor, y * factor, 1.0]]],
                                    jnp.float32),
        "prompt_box": None, "prompt_box_valid": None, "prompt_mask": None,
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

    panels = []
    for lvl in range(masks.shape[0]):
        m = masks[lvl, :rh, :rw] > 0
        m = cv2.resize(m.astype(np.uint8), (w, h),
                       interpolation=cv2.INTER_NEAREST)
        panel = overlay_mask(image, m)
        cv2.putText(panel, f"level {lvl} iou {float(ious[lvl]):.3f}",
                    (8, 24), cv2.FONT_HERSHEY_SIMPLEX, 0.7, (0, 0, 255), 2)
        panels.append(panel)
    cv2.imwrite(args.save, np.concatenate(panels, axis=1))
    print("predicted ious:", [round(float(v), 3) for v in ious])
    print("saved", args.save)


if __name__ == "__main__":
    main()
