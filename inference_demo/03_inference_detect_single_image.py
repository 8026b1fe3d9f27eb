"""Single-image detection inference demo (RetinaNet/FCOS, on-device decode).

Parity with /root/reference/inference_demo/
03.inference_detect_single_image.py:25-120: inline config, yolo-style
resize + pad preprocess, jitted forward, device decode, cv2 box rendering.
"""

import argparse
import os
import sys

BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(BASE_DIR)


class config:
    network = "resnet50_fcos"
    num_classes = 80
    input_image_size = 1024
    min_score_threshold = 0.3
    trained_model_path = ""


def preprocess_image(image_path, resize):
    import cv2
    import numpy as np
    origin = cv2.cvtColor(cv2.imread(image_path),
                          cv2.COLOR_BGR2RGB).astype(np.float32)
    h, w = origin.shape[:2]
    factor = resize / max(h, w)
    rh, rw = int(round(h * factor)), int(round(w * factor))
    resized = cv2.resize(origin, (rw, rh))
    canvas = np.zeros((resize, resize, 3), np.float32)
    canvas[:rh, :rw] = resized / 255.0
    return origin, canvas[None], factor


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--image",
        default=os.path.join(BASE_DIR, "gradio_demo", "test_images",
                             "detection", "sample_0.png"))
    parser.add_argument("--network", default=config.network)
    parser.add_argument("--checkpoint", default=config.trained_model_path)
    parser.add_argument("--save-path", default="detect_result.jpg")
    args = parser.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from simpleaicv_pytorch_training_examples_tpu.detection import (
        decode, models)
    from simpleaicv_pytorch_training_examples_tpu.detection.common import (
        load_state_dict)
    from simpleaicv_pytorch_training_examples_tpu.engine import (
        apply_pretrained, init_model)

    model = models.__dict__[args.network](num_classes=config.num_classes)
    load_state_dict(args.checkpoint, model)
    params, variables = init_model(
        model, (1, config.input_image_size, config.input_image_size, 3),
        jax.random.PRNGKey(0))
    params = apply_pretrained(model, params)

    decoder_cls = decode.FCOSDecoder if "fcos" in args.network \
        else decode.RetinaDecoder
    decoder = decoder_cls(min_score_threshold=config.min_score_threshold)

    origin, x, factor = preprocess_image(args.image,
                                         config.input_image_size)

    @jax.jit
    def forward(params, x):
        return model.apply({"params": params, **variables}, x, train=False)

    preds = forward(params, jnp.asarray(x))
    scores, classes, boxes = decoder(preds)
    img = cv2.cvtColor(origin.astype(np.uint8), cv2.COLOR_RGB2BGR)
    for s, c, b in zip(scores[0], classes[0], boxes[0]):
        if c < 0:
            continue
        b = b / factor
        cv2.rectangle(img, (int(b[0]), int(b[1])), (int(b[2]), int(b[3])),
                      (0, 255, 0), 2)
        cv2.putText(img, f"{int(c)}:{s:.2f}", (int(b[0]), int(b[1]) - 4),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.6, (0, 255, 0), 1)
        print(f"class {int(c)} score {s:.3f} box {b.tolist()}")
    cv2.imwrite(args.save_path, img)
    print(f"saved {args.save_path}")


if __name__ == "__main__":
    main()
