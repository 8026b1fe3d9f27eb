"""Single-image classification inference demo.

Parity with /root/reference/inference_demo/
00.inference_classification_single_image.py: inline config (model by
string name + checkpoint), preprocess mirroring the val transforms, jitted
forward on device, top-5 print.

Usage: python inference_demo/00_inference_classify_single_image.py \
           --image path.jpg [--network resnet50] [--checkpoint dir_or_pth]
"""

import argparse
import os
import sys

BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(BASE_DIR)


class config:
    network = "resnet50"
    num_classes = 1000
    input_image_size = 224
    scale = 256 / 224
    mean = [0.485, 0.456, 0.406]
    std = [0.229, 0.224, 0.225]
    trained_model_path = ""


def preprocess_image(image_path, resize, scale, mean, std):
    import cv2
    import numpy as np
    image = cv2.cvtColor(cv2.imread(image_path),
                         cv2.COLOR_BGR2RGB).astype(np.float32)
    h, w = image.shape[:2]
    short = int(resize * scale)
    if h <= w:
        nh, nw = short, max(1, int(round(w * short / h)))
    else:
        nh, nw = max(1, int(round(h * short / w))), short
    image = cv2.resize(image, (nw, nh))
    y = (nh - resize) // 2
    x = (nw - resize) // 2
    image = image[y:y + resize, x:x + resize]
    image = (image / 255.0 - np.asarray(mean)) / np.asarray(std)
    return image[None].astype(np.float32)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--image",
        default=os.path.join(BASE_DIR, "gradio_demo", "test_images",
                             "classification", "sample_0.png"))
    parser.add_argument("--network", default=config.network)
    parser.add_argument("--checkpoint", default=config.trained_model_path)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from simpleaicv_pytorch_training_examples_tpu.classification import (
        backbones)
    from simpleaicv_pytorch_training_examples_tpu.classification.common import (
        load_state_dict)
    from simpleaicv_pytorch_training_examples_tpu.engine import (
        apply_pretrained, init_model)

    model = backbones.__dict__[args.network](
        num_classes=config.num_classes)
    load_state_dict(args.checkpoint, model)
    params, variables = init_model(
        model, (1, config.input_image_size, config.input_image_size, 3),
        jax.random.PRNGKey(0))
    params = apply_pretrained(model, params)

    x = preprocess_image(args.image, config.input_image_size, config.scale,
                         config.mean, config.std)

    @jax.jit
    def forward(params, x):
        return model.apply({"params": params, **variables}, x, train=False)

    logits = np.asarray(forward(params, jnp.asarray(x)))[0]
    top5 = np.argsort(-logits)[:5]
    probs = np.exp(logits - logits.max())
    probs = probs / probs.sum()
    for i in top5:
        print(f"class {i}: prob {probs[i]:.4f}")


if __name__ == "__main__":
    main()
