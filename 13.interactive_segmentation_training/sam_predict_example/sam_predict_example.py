"""SAM prediction examples: point / box / mask prompts and matting.

Covers the reference's sam_b/sam_h predict notebooks
(/root/reference/13.interactive_segmentation_training/sam_predict_example/
sam_b_predict_example*.ipynb, sam_b_matting_*_predict_example*.ipynb,
sam_b_salient_object_detection_predict_example.ipynb) as one runnable
script — per prompt type, encode the image once and re-run the prompt
decoder (the SAM split-forward API).

Usage:
  python sam_predict_example.py --image img.jpg --checkpoint ckpt \
      [--network sam_b] [--point 512,512] [--box 100,100,800,800] \
      [--matting]
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
    p.add_argument("--network", default="sam_b")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--point", default="512,512")
    p.add_argument("--box", default=None, help="x0,y0,x1,y1")
    p.add_argument("--matting", action="store_true",
                   help="use the sam matting twin (fused alpha output)")
    p.add_argument("--save", default="sam_out.png")
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

    net = args.network + ("_matting" if args.matting else "")
    model = sam_models.__dict__[net]()
    resize = model.image_size

    image = cv2.cvtColor(cv2.imread(args.image),
                         cv2.COLOR_BGR2RGB).astype(np.float32)
    h, w = image.shape[:2]
    factor = resize / max(h, w)
    rh, rw = int(round(h * factor)), int(round(w * factor))
    canvas = np.zeros((resize, resize, 3), np.float32)
    canvas[:rh, :rw] = cv2.resize(image, (rw, rh)) / 255.0

    pts = np.full((1, 1, 3), -1.0, np.float32)
    if args.point:
        x, y = [float(v) for v in args.point.split(",")]
        pts[0, 0] = [x * factor, y * factor, 1.0]
    box = None
    box_valid = None
    if args.box:
        box = np.asarray([[float(v) * factor
                           for v in args.box.split(",")]], np.float32)
        box_valid = np.ones((1,), np.float32)
    prompts = {"prompt_point": jnp.asarray(pts),
               "prompt_box": None if box is None else jnp.asarray(box),
               "prompt_box_valid": None if box_valid is None else
               jnp.asarray(box_valid),
               "prompt_mask": None}

    load_state_dict(args.checkpoint, model)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(canvas[None]), prompts)
    params = apply_pretrained(model, variables.pop("params"))

    # split forward: encode once, decode per prompt set
    embedding = model.apply(
        {"params": params, **variables}, jnp.asarray(canvas[None]),
        method=type(model).forward_image_encoder)
    out = model.apply(
        {"params": params, **variables}, embedding, prompts,
        method=type(model).forward_prompt_encoder_mask_decoder)

    if args.matting:
        fused = np.asarray(out[2])[0, :rh, :rw]
        fused = fused[..., 0] if fused.ndim == 3 else fused
        vis = (cv2.resize(fused, (w, h)) * 255).astype(np.uint8)
    else:
        masks, ious = np.asarray(out[0])[0], np.asarray(out[1])[0]
        best = masks[ious.argmax(), :rh, :rw] > 0
        best = cv2.resize(best.astype(np.uint8), (w, h),
                          interpolation=cv2.INTER_NEAREST)
        vis = image.copy()
        vis[best > 0] = vis[best > 0] * 0.5 + np.array([0, 255, 0]) * 0.5
        vis = cv2.cvtColor(vis.astype(np.uint8), cv2.COLOR_RGB2BGR)
        print("predicted ious:", [round(float(v), 3) for v in ious])
    cv2.imwrite(args.save, vis)
    print("saved", args.save)


if __name__ == "__main__":
    main()
