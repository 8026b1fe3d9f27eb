"""SAM2 streaming video prediction example.

Covers the reference's sam2video test-predict notebooks
(/root/reference/14.video_interactive_segmentation_training/
sam2_predict_example/hiera_*_sam2video_test_predict_example*.ipynb): click
an object on frame 0, then stream every following frame through the jitted
track_frame step (fixed-shape memory carry — no recompilation, any video
length).

Usage:
  python sam2_video_predict_example.py --video clip.mp4 --checkpoint ckpt \
      [--network sam2_hiera_base_plus_video] [--point 512,512] \
      [--out-dir tracked/]
"""

import argparse
import os
import sys

BASE_DIR = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
sys.path.append(BASE_DIR)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video", required=True)
    p.add_argument("--network", default="sam2_hiera_base_plus_video")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--point", default="512,512")
    p.add_argument("--max-frames", type=int, default=100)
    p.add_argument("--out-dir", default="sam2_tracked")
    args = p.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from simpleaicv_pytorch_training_examples_tpu.classification.common import (
        load_state_dict)
    from simpleaicv_pytorch_training_examples_tpu.engine import (
        apply_pretrained)
    from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.models.segment_anything2 import (
        sam2 as sam2_models)
    from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.models.segment_anything2.sam2_stream import (
        SAM2VideoStream)

    base = sam2_models.__dict__[args.network]()
    model = SAM2VideoStream(**{f.name: getattr(base, f.name)
                               for f in base.__dataclass_fields__.values()
                               if f.name != "parent" and f.name != "name"})
    resize = model.image_size

    cap = cv2.VideoCapture(args.video)
    frames = []
    while len(frames) < args.max_frames:
        ret, frame = cap.read()
        if not ret:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    assert frames, "no frames decoded"
    h, w = frames[0].shape[:2]
    factor = resize / max(h, w)
    rh, rw = int(round(h * factor)), int(round(w * factor))

    def prep(frame):
        canvas = np.zeros((resize, resize, 3), np.float32)
        canvas[:rh, :rw] = cv2.resize(frame.astype(np.float32),
                                      (rw, rh)) / 255.0
        return jnp.asarray(canvas[None])

    x, y = [float(v) for v in args.point.split(",")]
    prompts = {"prompt_point": jnp.asarray(
        [[[x * factor, y * factor, 1.0]]], jnp.float32),
        "prompt_box": None, "prompt_mask": None}

    load_state_dict(args.checkpoint, model)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 1, resize, resize, 3)), prompts)
    variables = dict(variables)
    variables["params"] = apply_pretrained(model, variables["params"])

    encode = jax.jit(lambda v, im: model.apply(
        v, im, method=SAM2VideoStream.encode_frame))
    start = jax.jit(lambda v, f, pr: model.apply(
        v, f, pr, method=SAM2VideoStream.start_track))
    step = jax.jit(lambda v, f, pos, c: model.apply(
        v, f, pos, c, method=SAM2VideoStream.track_frame))

    os.makedirs(args.out_dir, exist_ok=True)

    def save(i, frame, masks, ious):
        best = np.asarray(masks)[0][int(np.asarray(ious)[0].argmax())]
        m = cv2.resize((best[:rh, :rw] > 0).astype(np.uint8), (w, h),
                       interpolation=cv2.INTER_NEAREST)
        vis = frame.astype(np.float32)
        vis[m > 0] = vis[m > 0] * 0.5 + np.array([0, 255, 0]) * 0.5
        cv2.imwrite(os.path.join(args.out_dir, f"{i:05d}.jpg"),
                    cv2.cvtColor(vis.astype(np.uint8), cv2.COLOR_RGB2BGR))

    feat, _ = encode(variables, prep(frames[0]))
    (masks, ious, _), carry = start(variables, feat, prompts)
    save(0, frames[0], masks, ious)
    for i, frame in enumerate(frames[1:], start=1):
        feat, pos = encode(variables, prep(frame))
        (masks, ious, _), carry = step(variables, feat, pos, carry)
        save(i, frame, masks, ious)
    print(f"tracked {len(frames)} frames -> {args.out_dir}/")


if __name__ == "__main__":
    main()
