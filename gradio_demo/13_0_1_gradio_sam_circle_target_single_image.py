"""Gradio sam_circle demo (parity with /root/reference/gradio_demo/
13.0.1.gradio_sam_circle_target_single_image.py).

The user circles the target with the ImageEditor brush; the brushed
layer's alpha becomes a mask whose bounding rect is the SAM box prompt —
exactly the reference flow (:115-133). gradio is not baked into this
image; the app is import-gated and `extract_circle_box` + the box
predictor (inference_demo/_predictors.py::predict_sam_box) also power the
CLI demo of the same number.
"""

import os
import sys

BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(BASE_DIR)
sys.path.append(os.path.join(BASE_DIR, "inference_demo"))

import numpy as np

import _predictors as P  # noqa: E402

NETWORK = "sam_b"
CHECKPOINT = ""


def extract_circle_box(editor_value):
    """ImageEditor dict {background, layers, composite} -> (image RGB
    float32, [x1, y1, x2, y2] bounding box of the brushed region), or
    (None, None) when nothing usable was drawn."""
    if editor_value is None:
        return None, None
    image = editor_value.get("background")
    layers = editor_value.get("layers") or []
    if image is None or not layers:
        return None, None
    image = np.asarray(image)
    if image.shape[-1] == 4:
        image = image[:, :, :3]
    layer = np.asarray(layers[0])
    if layer.shape[-1] == 4:
        mask = layer[:, :, 3]
    else:
        mask = (np.any(layer > 0, axis=2)).astype(np.uint8) * 255
    if mask.sum() == 0:
        return None, None
    ys, xs = np.nonzero(mask)
    box = [float(xs.min()), float(ys.min()),
           float(xs.max()) + 1.0, float(ys.max()) + 1.0]
    return image.astype(np.float32), box


def run(editor_value, network, checkpoint):
    image, box = extract_circle_box(editor_value)
    if image is None:
        return None
    mask = P.predict_sam_box(image, box, network, checkpoint)
    return P.overlay_mask(image.astype("uint8"), mask)


def main():
    try:
        import gradio as gr
    except ImportError:
        print("gradio is not installed in this environment; use the "
              "matching CLI demo under inference_demo/ instead.")
        return
    app = gr.Interface(
        fn=lambda editor: run(editor, NETWORK, CHECKPOINT),
        inputs=gr.ImageEditor(type="numpy"),
        outputs=gr.Image(),
        description="Circle the target with the brush; the brushed "
                    "region's bounding box prompts SAM.")
    app.launch()


if __name__ == "__main__":
    main()
