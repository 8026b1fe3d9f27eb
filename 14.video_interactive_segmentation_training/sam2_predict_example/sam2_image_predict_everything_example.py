"""SAM2-image "predict everything" example (grid-prompted automatic
masks over the Hiera encoder).

Parity with /root/reference/14.video_interactive_segmentation_training/
sam2_predict_example/hiera_l_sam2image_predict_everything_example.ipynb:
sweep a point grid over the SAM2 image model, filter by predicted IoU +
stability, NMS, paint all surviving masks. Reuses the shared
SAMAutomaticMaskGenerator (the decoder contract is identical; SAM2's
extra object logit is ignored by the generator).

Usage:
  python sam2_image_predict_everything_example.py --synthetic \
      [--network sam2_hiera_large_image] [--points-per-side 16]
  python sam2_image_predict_everything_example.py --image img.jpg \
      --checkpoint ckpt
"""

import argparse

import numpy as np

from _example_common import BASE_DIR  # noqa: F401 (sys.path setup)
from _example_common import load_or_synthesize_frames


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image", default="")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--network", default="sam2_hiera_large_image")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--points-per-side", type=int, default=16)
    p.add_argument("--image-size", type=int, default=0,
                   help="override model input size (tests use 128)")
    p.add_argument("--save", default="sam2_everything.png")
    args = p.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from simpleaicv_pytorch_training_examples_tpu.classification.common import (
        load_state_dict)
    from simpleaicv_pytorch_training_examples_tpu.engine import (
        apply_pretrained)
    from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation.automatic_mask_generator import (
        SAMAutomaticMaskGenerator)
    from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.models.segment_anything2 import (
        sam2_image as sam2_image_models)

    if args.synthetic or not args.image:
        image = load_or_synthesize_frames(None, max_frames=1)[0].astype(
            np.float32)
    else:
        image = cv2.cvtColor(cv2.imread(args.image),
                             cv2.COLOR_BGR2RGB).astype(np.float32)
    h, w = image.shape[:2]

    model_kw = {"image_size": args.image_size} if args.image_size else {}
    model = sam2_image_models.__dict__[args.network](**model_kw)
    resize = model.image_size
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
