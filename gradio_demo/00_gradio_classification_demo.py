"""Gradio classification demo.

Parity with /root/reference/gradio_demo/*: interactive single-image UI over
the jitted forward. gradio is not baked into this image; the demo degrades
to a clear message when absent (install gradio to use).
"""

import os
import sys

BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(BASE_DIR)

try:
    import gradio as gr
except ImportError:
    gr = None


class config:
    network = "resnet50"
    num_classes = 1000
    input_image_size = 224
    trained_model_path = ""


def build_predict_fn():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from simpleaicv_pytorch_training_examples_tpu.classification import (
        backbones)
    from simpleaicv_pytorch_training_examples_tpu.classification.common import (
        load_state_dict)
    from simpleaicv_pytorch_training_examples_tpu.engine import (
        apply_pretrained, init_model)

    model = backbones.__dict__[config.network](
        num_classes=config.num_classes)
    load_state_dict(config.trained_model_path, model)
    params, variables = init_model(
        model, (1, config.input_image_size, config.input_image_size, 3),
        jax.random.PRNGKey(0))
    params = apply_pretrained(model, params)

    @jax.jit
    def forward(x):
        return model.apply({"params": params, **variables}, x, train=False)

    def predict(image):
        import cv2
        x = cv2.resize(np.asarray(image),
                       (config.input_image_size, config.input_image_size))
        x = (x / 255.0 - np.array([0.485, 0.456, 0.406])) / \
            np.array([0.229, 0.224, 0.225])
        logits = np.asarray(forward(jnp.asarray(
            x[None].astype(np.float32))))[0]
        probs = np.exp(logits - logits.max())
        probs /= probs.sum()
        top5 = np.argsort(-probs)[:5]
        return {str(i): float(probs[i]) for i in top5}

    return predict


def main():
    if gr is None:
        print("gradio is not installed in this environment; "
              "`pip install gradio` to launch the UI. The predict fn is "
              "importable via build_predict_fn() regardless.")
        return
    sys.path.append(os.path.join(BASE_DIR, "gradio_demo"))
    from make_sample_images import sample_images
    demo = gr.Interface(fn=build_predict_fn(), inputs=gr.Image(),
                        outputs=gr.Label(num_top_classes=5),
                        examples=[[p] for p in
                                  sample_images("classification")],
                        title="TPU classification demo")
    demo.launch()


if __name__ == "__main__":
    main()
