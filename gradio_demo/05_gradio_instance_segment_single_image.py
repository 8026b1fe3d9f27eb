"""Gradio instance demo (parity with /root/reference/gradio_demo/05.gradio_instance_segment_single_image.py).

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

NETWORK = "resnet50_solov2"
CHECKPOINT = ""


def run(image, network, checkpoint):
    import cv2
    import numpy as np
    image = np.asarray(image, dtype="float32")
    scores, classes, masks = P.predict_instance(image, network, checkpoint)
    vis = image.astype("uint8")
    for i in range(len(scores)):
        m = cv2.resize(masks[i], (image.shape[1], image.shape[0]),
                       interpolation=cv2.INTER_NEAREST)
        vis = P.overlay_mask(vis, m, P.palette()[int(classes[i]) % 256].tolist())
    return vis


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
        examples=[[p] for p in sample_images("instance_segmentation")],
        outputs=gr.Image() if "instance" != "textrec" else gr.Text())
    app.launch()


if __name__ == "__main__":
    main()
