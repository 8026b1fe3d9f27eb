"""Shared helpers for the SAM2 predict examples (reference ships these as
7 notebooks under 14.video_interactive_segmentation_training/
sam2_predict_example/*.ipynb; every script here accepts --synthetic)."""

import os
import sys

import numpy as np

BASE_DIR = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
if BASE_DIR not in sys.path:
    sys.path.append(BASE_DIR)


def load_or_synthesize_frames(video_path, max_frames=16, size=512):
    """Decode a video, or synthesize a clip of two moving discs so every
    example runs without data (--synthetic)."""
    import cv2
    if video_path:
        cap = cv2.VideoCapture(video_path)
        frames = []
        while len(frames) < max_frames:
            ret, frame = cap.read()
            if not ret:
                break
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        cap.release()
        assert frames, "no frames decoded"
        return frames
    rs = np.random.RandomState(0)
    frames = []
    for t in range(max_frames):
        img = (rs.rand(size, size, 3) * 50).astype(np.float32)
        cv2.circle(img, (size // 4 + 8 * t, size // 2), size // 8,
                   (220.0, 180.0, 60.0), -1)
        cv2.circle(img, (3 * size // 4 - 8 * t, size // 2), size // 10,
                   (60.0, 200.0, 220.0), -1)
        frames.append(img.astype(np.uint8))
    return frames


def build_stream_model(network, checkpoint, resize_probe_prompts):
    """Construct the streaming SAM2 tracker + init; returns
    (model, variables)."""
    import jax
    import jax.numpy as jnp

    from simpleaicv_pytorch_training_examples_tpu.classification.common import (
        load_state_dict)
    from simpleaicv_pytorch_training_examples_tpu.engine import (
        apply_pretrained)
    from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.models.segment_anything2 import (
        sam2 as sam2_models)
    from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.models.segment_anything2.sam2_stream import (
        SAM2VideoStream)

    base = sam2_models.__dict__[network]()
    model = SAM2VideoStream(**{f.name: getattr(base, f.name)
                               for f in base.__dataclass_fields__.values()
                               if f.name not in ("parent", "name")})
    load_state_dict(checkpoint, model)
    resize = model.image_size
    # 2-frame init: the tracked-frame path (memory attention, pointer
    # time projection, mask-prompt downsample) must be traced so its
    # params exist before the per-frame jitted step functions run
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 2, resize, resize, 3)),
                           resize_probe_prompts)
    variables = dict(variables)
    variables["params"] = apply_pretrained(model, variables["params"])
    return model, variables


def frame_prep_fn(resize, hw):
    import cv2
    import jax.numpy as jnp
    h, w = hw
    factor = resize / max(h, w)
    rh, rw = int(round(h * factor)), int(round(w * factor))

    def prep(frame):
        canvas = np.zeros((resize, resize, 3), np.float32)
        canvas[:rh, :rw] = cv2.resize(frame.astype(np.float32),
                                      (rw, rh)) / 255.0
        return jnp.asarray(canvas[None])

    return prep, factor, (rh, rw)
