"""Gradio classification demo (parity with /root/reference/gradio_demo/00.gradio_classify_single_image.py).

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

NETWORK = "resnet50"
CHECKPOINT = ""


def run(image, network, checkpoint):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from simpleaicv_pytorch_training_examples_tpu.classification import (
        backbones)
    image = np.asarray(image, dtype="float32")
    x, _ = P.pad_resize(image, 224, mean=(0.485, 0.456, 0.406),
                        std=(0.229, 0.224, 0.225))
    model = backbones.__dict__[network](num_classes=1000)
    params, forward = P.build(model, (224, 224), checkpoint)
    logits = np.asarray(forward(params, jnp.asarray(x)))[0]
    top5 = np.argsort(-logits)[:5]
    return "\n".join(f"class {i}" for i in top5)


def main():
    try:
        import gradio as gr
    except ImportError:
        print("gradio is not installed in this environment; use the "
              "matching CLI demo under inference_demo/ instead.")
        return
    app = gr.Interface(
        fn=lambda img: run(img, NETWORK, CHECKPOINT),
        inputs=gr.Image(type="numpy"), outputs=gr.Text(),
        examples=[[p] for p in sample_images("classification")])
    app.launch()


if __name__ == "__main__":
    main()
