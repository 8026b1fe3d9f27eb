"""SAM2 video matting prediction example.

Parity with /root/reference/14.video_interactive_segmentation_training/
sam2_predict_example/
hiera_b_plus_sam2video_matting_test_predict_example_train.ipynb: click the
subject on frame 0, run the memory-conditioned SAM2VideoMatting model over
the clip, and save the per-frame fused alpha mattes plus green-screen
composites.

Usage:
  python sam2_video_matting_predict_example.py --synthetic --max-frames 4 \
      [--network sam2_hiera_base_plus_video_matting]
  python sam2_video_matting_predict_example.py --video clip.mp4 \
      --checkpoint ckpt --point 512,512 [--out-dir matted/]
"""

import argparse
import os

import numpy as np

from _example_common import load_or_synthesize_frames


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video", default="")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--network", default="sam2_hiera_base_plus_video_matting")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--point", default="128,256")
    p.add_argument("--max-frames", type=int, default=8)
    p.add_argument("--image-size", type=int, default=0,
                   help="override model input size (tests use 128)")
    p.add_argument("--out-dir", default="sam2_matted")
    args = p.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from simpleaicv_pytorch_training_examples_tpu.classification.common import (
        load_state_dict)
    from simpleaicv_pytorch_training_examples_tpu.engine import (
        apply_pretrained)
    from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.models import (
        segment_anything2_matting as sam2_matting_models)

    frames = load_or_synthesize_frames(
        None if args.synthetic else args.video, max_frames=args.max_frames)
    h, w = frames[0].shape[:2]

    model_kw = {"image_size": args.image_size} if args.image_size else {}
    model = sam2_matting_models.__dict__[args.network](**model_kw)
    resize = model.image_size
    factor = resize / max(h, w)
    rh, rw = int(round(h * factor)), int(round(w * factor))

    clip = np.zeros((1, len(frames), resize, resize, 3), np.float32)
    for t, f in enumerate(frames):
        clip[0, t, :rh, :rw] = cv2.resize(f.astype(np.float32),
                                          (rw, rh)) / 255.0
    clip = jnp.asarray(clip)

    x, y = [float(v) for v in args.point.split(",")]
    prompts = {"prompt_point": jnp.asarray(
        [[[x * factor, y * factor, 1.0]]], jnp.float32),
        "prompt_box": None, "prompt_mask": None}

    load_state_dict(args.checkpoint, model)
    variables = model.init({"params": jax.random.PRNGKey(0)}, clip[:, :2],
                           prompts)
    variables = dict(variables)
    variables["params"] = apply_pretrained(model, variables["params"])

    run = jax.jit(lambda v, images, pr: model.apply(v, images, pr))
    # per-frame: (global trimap, local alpha, fused alpha, ious, obj)
    _, _, fused, _ious, _obj = run(variables, clip, prompts)
    fused = np.asarray(fused)[0]  # [T,H,W,1]

    os.makedirs(args.out_dir, exist_ok=True)
    green = np.zeros((h, w, 3), np.float32)
    green[:] = (0, 177, 64)
    for t, frame in enumerate(frames):
        a = np.clip(fused[t, :rh, :rw, 0], 0.0, 1.0)
        alpha = cv2.resize(a, (w, h))[..., None]
        cv2.imwrite(os.path.join(args.out_dir, f"{t:05d}_alpha.png"),
                    (alpha[..., 0] * 255).astype(np.uint8))
        comp = frame.astype(np.float32) * alpha + green * (1 - alpha)
        cv2.imwrite(os.path.join(args.out_dir, f"{t:05d}_comp.jpg"),
                    cv2.cvtColor(comp.astype(np.uint8), cv2.COLOR_RGB2BGR))
    print(f"saved {len(frames)} alpha/composite pairs -> {args.out_dir}; "
          f"alpha range [{fused.min():.3f}, {fused.max():.3f}]")


if __name__ == "__main__":
    main()
