"""SAM2 single-image prediction example (Hiera encoder, no memory).

Covers /root/reference/14.video_interactive_segmentation_training/
sam2_predict_example/hiera_l_sam2image_predict_example.ipynb: prompt the
SAM2Image model with a click and/or box, save the best mask overlay.

Usage:
  python sam2_image_predict_example.py --synthetic
  python sam2_image_predict_example.py --image img.jpg --point 320,320 \
      [--box x0,y0,x1,y1] [--network sam2_hiera_large_image]
"""

import argparse

import numpy as np

from _example_common import BASE_DIR  # noqa: F401 (sys.path side effect)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image", default="")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--network", default="sam2_hiera_base_plus_image")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--point", default="320,320")
    p.add_argument("--box", default=None)
    p.add_argument("--save", default="sam2_image_out.png")
    args = p.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from simpleaicv_pytorch_training_examples_tpu.classification.common import (
        load_state_dict)
    from simpleaicv_pytorch_training_examples_tpu.engine import (
        apply_pretrained)
    from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.models.segment_anything2 import (
        sam2_image as sam2_image_models)

    if args.synthetic or not args.image:
        rs = np.random.RandomState(0)
        image = rs.rand(640, 640, 3).astype(np.float32) * 60
        cv2.circle(image, (320, 320), 128, (220.0, 200.0, 60.0), -1)
    else:
        image = cv2.cvtColor(cv2.imread(args.image),
                             cv2.COLOR_BGR2RGB).astype(np.float32)
    h, w = image.shape[:2]

    model = sam2_image_models.__dict__[args.network]()
    resize = model.image_size
    factor = resize / max(h, w)
    rh, rw = int(round(h * factor)), int(round(w * factor))
    canvas = np.zeros((resize, resize, 3), np.float32)
    canvas[:rh, :rw] = cv2.resize(image, (rw, rh)) / 255.0

    x, y = [float(v) for v in args.point.split(",")]
    prompts = {
        "prompt_point": jnp.asarray([[[x * factor, y * factor, 1.0]]],
                                    jnp.float32),
        "prompt_box": None, "prompt_box_valid": None, "prompt_mask": None,
    }
    if args.box:
        prompts["prompt_box"] = jnp.asarray(
            [[float(v) * factor for v in args.box.split(",")]], jnp.float32)
        prompts["prompt_box_valid"] = jnp.ones((1,), jnp.float32)

    load_state_dict(args.checkpoint, model)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(canvas[None]), prompts)
    variables = dict(variables)
    variables["params"] = apply_pretrained(model, variables["params"])

    out = model.apply(variables, jnp.asarray(canvas[None]), prompts)
    masks, ious = np.asarray(out[0])[0], np.asarray(out[1])[0]
    best = masks[ious.argmax(), :rh, :rw] > 0
    best = cv2.resize(best.astype(np.uint8), (w, h),
                      interpolation=cv2.INTER_NEAREST)
    vis = image.copy()
    vis[best > 0] = vis[best > 0] * 0.5 + np.array([0, 255, 0]) * 0.5
    cv2.imwrite(args.save, cv2.cvtColor(vis.astype(np.uint8),
                                        cv2.COLOR_RGB2BGR))
    print("predicted ious:", [round(float(v), 3) for v in ious])
    print("saved", args.save)


if __name__ == "__main__":
    main()
