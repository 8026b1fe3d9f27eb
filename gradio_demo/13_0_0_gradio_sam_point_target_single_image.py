"""Gradio sam_point demo (parity with /root/reference/gradio_demo/13.0.0.gradio_sam_point_target_single_image.py).

gradio is not baked into this image; the app is import-gated and the
underlying predictor (inference_demo/_predictors.py) also powers the CLI
demo of the same number.
"""

import os
import sys

BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(BASE_DIR)
sys.path.append(os.path.join(BASE_DIR, "inference_demo"))

import _predictors as P  # noqa: E402

sys.path.append(os.path.join(BASE_DIR, "gradio_demo"))
from make_sample_images import sample_images  # noqa: E402

NETWORK = "sam_b"
CHECKPOINT = ""


def run(image, network, checkpoint, x, y):
    import numpy as np
    image = np.asarray(image, dtype="float32")
    mask = P.predict_sam(image, [[float(x), float(y)]], network, checkpoint)
    return P.overlay_mask(image.astype("uint8"), mask)


def main():
    try:
        import gradio as gr
    except ImportError:
        print("gradio is not installed in this environment; use the "
              "matching CLI demo under inference_demo/ instead.")
        return
    app = gr.Interface(
        fn=lambda img, x, y: run(img, NETWORK, CHECKPOINT, x, y),
        inputs=[gr.Image(type="numpy"), gr.Number(512), gr.Number(512)],
        outputs=gr.Image(),
        examples=[[p, 240, 180]
                  for p in sample_images("interactive_segmentation")])
    app.launch()


if __name__ == "__main__":
    main()
