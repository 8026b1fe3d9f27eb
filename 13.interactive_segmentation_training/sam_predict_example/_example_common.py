"""Shared helpers for the SAM predict examples (the reference ships these
as 9 notebooks under 13.interactive_segmentation_training/
sam_predict_example/*.ipynb; here each notebook is a runnable script and
every script accepts --synthetic to run without any image on disk)."""

import os
import sys

import numpy as np

BASE_DIR = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
if BASE_DIR not in sys.path:
    sys.path.append(BASE_DIR)


def load_or_synthesize_image(path, size=640):
    """Load an RGB image, or synthesize one (bright disc on dark noise) so
    every example is runnable with --synthetic."""
    import cv2
    if path:
        return cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB).astype(
            np.float32)
    rs = np.random.RandomState(0)
    img = rs.rand(size, size, 3).astype(np.float32) * 60
    cv2.circle(img, (size // 2, size // 2), size // 5,
               (220.0, 200.0, 60.0), -1)
    return img


def build_sam(network, checkpoint, canvas, prompts, **model_kw):
    """Construct + init a SAM model, apply a checkpoint if given; returns
    (model, params, variables). model_kw (e.g. image_size=256) lets tests
    drive the examples at small scale."""
    import jax
    import jax.numpy as jnp

    from simpleaicv_pytorch_training_examples_tpu.classification.common import (
        load_state_dict)
    from simpleaicv_pytorch_training_examples_tpu.engine import (
        apply_pretrained)
    from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation import (
        models as sam_models)

    model = sam_models.__dict__[network](**model_kw)
    load_state_dict(checkpoint, model)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(canvas[None]), prompts)
    params = apply_pretrained(model, variables.pop("params"))
    return model, params, variables


def prep_canvas(image, resize):
    """Resize long side to `resize`, pad to square; returns
    (canvas, factor, (rh, rw))."""
    import cv2
    h, w = image.shape[:2]
    factor = resize / max(h, w)
    rh, rw = int(round(h * factor)), int(round(w * factor))
    canvas = np.zeros((resize, resize, 3), np.float32)
    canvas[:rh, :rw] = cv2.resize(image, (rw, rh)) / 255.0
    return canvas, factor, (rh, rw)


def overlay_mask(image, mask_resized_hw, color=(0, 255, 0)):
    import cv2
    vis = image.copy()
    vis[mask_resized_hw > 0] = (vis[mask_resized_hw > 0] * 0.5 +
                                np.array(color, np.float32) * 0.5)
    return cv2.cvtColor(vis.astype(np.uint8), cv2.COLOR_RGB2BGR)
