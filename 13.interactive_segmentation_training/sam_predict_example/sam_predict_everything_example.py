"""SAM "predict everything" example (grid-prompted automatic masks).

Parity with /root/reference/13.interactive_segmentation_training/
sam_predict_example/sam_h_predict_everything_example.ipynb: sweep a point
grid, decode every point, filter by predicted IoU + stability, NMS, and
paint all surviving masks.

Usage:
  python sam_predict_everything_example.py --image img.jpg \
      --checkpoint ckpt [--network sam_h] [--points-per-side 32]
"""

import argparse
import os
import sys

BASE_DIR = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
sys.path.append(BASE_DIR)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image", required=True)
    p.add_argument("--network", default="sam_h")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--points-per-side", type=int, default=32)
    p.add_argument("--save", default="sam_everything.png")
    args = p.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from simpleaicv_pytorch_training_examples_tpu.classification.common import (
        load_state_dict)
    from simpleaicv_pytorch_training_examples_tpu.engine import (
        apply_pretrained)
    from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation import (
        models as sam_models)
    from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation.automatic_mask_generator import (
        SAMAutomaticMaskGenerator)

    model = sam_models.__dict__[args.network]()
    resize = model.image_size
    image = cv2.cvtColor(cv2.imread(args.image),
                         cv2.COLOR_BGR2RGB).astype(np.float32)
    h, w = image.shape[:2]
    factor = resize / max(h, w)
    rh, rw = int(round(h * factor)), int(round(w * factor))
    canvas = np.zeros((resize, resize, 3), np.float32)
    canvas[:rh, :rw] = cv2.resize(image, (rw, rh)) / 255.0

    load_state_dict(args.checkpoint, model)
    prompts = {"prompt_point": jnp.full((1, 1, 3), -1.0),
               "prompt_box": None, "prompt_mask": None}
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(canvas[None]), prompts)
    variables = dict(variables)
    variables["params"] = apply_pretrained(model, variables["params"])

    gen = SAMAutomaticMaskGenerator(
        model, variables, points_per_side=args.points_per_side)
    results = gen.generate(canvas)
    print(f"{len(results)} masks")

    rs = np.random.RandomState(0)
    vis = image.copy()
    for r in sorted(results, key=lambda r: -r["area"]):
        color = rs.randint(0, 255, 3).astype(np.float32)
        m = cv2.resize(r["mask"][:rh, :rw].astype(np.uint8), (w, h),
                       interpolation=cv2.INTER_NEAREST) > 0
        vis[m] = vis[m] * 0.55 + color * 0.45
    cv2.imwrite(args.save, cv2.cvtColor(vis.astype(np.uint8),
                                        cv2.COLOR_RGB2BGR))
    print("saved", args.save)


if __name__ == "__main__":
    main()
