"""SAM COCO-image prediction example: prompt SAM with ground-truth boxes
from a COCO-format annotation file and paint every decoded instance.

Parity with /root/reference/13.interactive_segmentation_training/
sam_predict_example/sam_b_predict_coco_image_example.ipynb (decode one
mask per COCO annotation box on a chosen image).

Usage:
  python sam_coco_image_predict_example.py --synthetic [--network sam_b]
  python sam_coco_image_predict_example.py --image-dir val2017 \
      --annotations instances_val2017.json --image-id 139 --checkpoint ckpt
"""

import argparse
import json
import os

import numpy as np

from _example_common import (build_sam, load_or_synthesize_image,
                             prep_canvas)


def _synthetic_coco(tmp_dir, size=640):
    """Write a 1-image COCO json whose two boxes frame the synthetic disc
    halves so the example runs with no data on disk."""
    c = size // 2
    r = size // 5
    ann = {
        "images": [{"id": 1, "file_name": "synthetic.jpg",
                    "height": size, "width": size}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1,
             "bbox": [c - r, c - r, r, 2 * r], "area": 2 * r * r},
            {"id": 2, "image_id": 1, "category_id": 1,
             "bbox": [c, c - r, r, 2 * r], "area": 2 * r * r},
        ],
        "categories": [{"id": 1, "name": "disc"}],
    }
    path = os.path.join(tmp_dir, "synthetic_coco.json")
    with open(path, "w") as f:
        json.dump(ann, f)
    return path, 1


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image-dir", default="")
    p.add_argument("--annotations", default="")
    p.add_argument("--image-id", type=int, default=-1)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--network", default="sam_b")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--max-instances", type=int, default=8)
    p.add_argument("--image-size", type=int, default=0,
                   help="override model input size (tests use 256)")
    p.add_argument("--save", default="sam_coco.png")
    args = p.parse_args()

    import cv2
    import jax.numpy as jnp

    if args.synthetic or not args.annotations:
        import tempfile
        tmp = tempfile.mkdtemp()
        ann_path, image_id = _synthetic_coco(tmp)
        image = load_or_synthesize_image(None)
    else:
        ann_path, image_id = args.annotations, args.image_id
    with open(ann_path) as f:
        coco = json.load(f)
    img_rec = next((i for i in coco["images"]
                    if image_id < 0 or i["id"] == image_id), None)
    assert img_rec is not None, f"image id {image_id} not in {ann_path}"
    if not (args.synthetic or not args.annotations):
        image = cv2.cvtColor(
            cv2.imread(os.path.join(args.image_dir, img_rec["file_name"])),
            cv2.COLOR_BGR2RGB).astype(np.float32)

    boxes = [a["bbox"] for a in coco["annotations"]
             if a["image_id"] == img_rec["id"]][:args.max_instances]
    assert boxes, "no annotations for this image"
    h, w = image.shape[:2]

    from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation import (
        models as sam_models)
    model_kw = {"image_size": args.image_size} if args.image_size else {}
    resize = sam_models.__dict__[args.network](**model_kw).image_size
    canvas, factor, (rh, rw) = prep_canvas(image, resize)

    # one box prompt per instance (xywh -> xyxy, model scale)
    n = len(boxes)
    xyxy = np.asarray([[x, y, x + bw, y + bh] for x, y, bw, bh in boxes],
                      np.float32) * factor
    prompts = {
        "prompt_point": jnp.full((n, 1, 3), -1.0, jnp.float32),
        "prompt_box": jnp.asarray(xyxy),
        "prompt_box_valid": jnp.ones((n,), jnp.float32),
        "prompt_mask": None,
    }
    model, params, variables = build_sam(args.network, args.checkpoint,
                                         canvas, {
                                             "prompt_point": prompts["prompt_point"][:1],
                                             "prompt_box": prompts["prompt_box"][:1],
                                             "prompt_box_valid": prompts["prompt_box_valid"][:1],
                                             "prompt_mask": None,
                                         }, **model_kw)
    embedding = model.apply(
        {"params": params, **variables}, jnp.asarray(canvas[None]),
        method=type(model).forward_image_encoder)
    emb = jnp.broadcast_to(embedding, (n, *embedding.shape[1:]))
    masks, ious = model.apply(
        {"params": params, **variables}, emb, prompts,
        method=type(model).forward_prompt_encoder_mask_decoder)[:2]
    masks, ious = np.asarray(masks), np.asarray(ious)

    rs = np.random.RandomState(0)
    vis = image.copy()
    for i in range(n):
        best = int(ious[i].argmax())
        m = cv2.resize((masks[i, best, :rh, :rw] > 0).astype(np.uint8),
                       (w, h), interpolation=cv2.INTER_NEAREST) > 0
        color = rs.randint(0, 255, 3).astype(np.float32)
        vis[m] = vis[m] * 0.55 + color * 0.45
        print(f"instance {i}: box={boxes[i]} iou={ious[i, best]:.3f} "
              f"area={int(m.sum())}")
    cv2.imwrite(args.save, cv2.cvtColor(vis.astype(np.uint8),
                                        cv2.COLOR_RGB2BGR))
    print("saved", args.save)


if __name__ == "__main__":
    main()
