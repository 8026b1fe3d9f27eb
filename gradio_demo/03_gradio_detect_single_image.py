"""Gradio detect demo (parity with /root/reference/gradio_demo/03.gradio_detect_single_image.py).

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

NETWORK = "resnet50_retinanet"
CHECKPOINT = ""


def run(image, network, checkpoint):
    import numpy as np
    image = np.asarray(image, dtype="float32")
    boxes, scores, classes = P.predict_detection(image, network, checkpoint)
    return P.draw_boxes(image.astype("uint8"), boxes, scores)


def main():
    try:
        import gradio as gr
    except ImportError:
        print("gradio is not installed in this environment; use the "
              "matching CLI demo under inference_demo/ instead.")
        return
    app = gr.Interface(
        fn=lambda img: run(img, NETWORK, CHECKPOINT),
        inputs=gr.Image(type="numpy"),
        examples=[[p] for p in sample_images("detection")],
        outputs=gr.Image() if "detect" != "textrec" else gr.Text())
    app.launch()


if __name__ == "__main__":
    main()
