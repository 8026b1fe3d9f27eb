"""Single-image human parsing inference demo.

Parity with /root/reference/gradio_demo/12.gradio_human_parsing_single_image.py (the
reference ships these as gradio apps; the CLI here shares the same
predictor — see gradio_demo/ for the UI wrapper).

Usage: python inference_demo/12_inference_human_parsing_single_image.py \
           --image path.jpg [--network resnet50_pfan_human_parsing] [--checkpoint ckpt]
"""

import argparse
import os
import sys

BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(BASE_DIR)

import _predictors as P  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--image",
        default=os.path.join(BASE_DIR, "gradio_demo", "test_images",
                             "human_parsing", "sample_0.png"))
    parser.add_argument("--network", default="resnet50_pfan_human_parsing")
    parser.add_argument("--checkpoint", default="")
    parser.add_argument("--save", default="out.png")
    parser.add_argument('--num-classes', type=int, default=20)
    args = parser.parse_args()

    image = P.load_image(args.image)
    from simpleaicv_pytorch_training_examples_tpu.human_parsing import (
        models as human_models)
    class_map = P.predict_semantic(image, args.network, args.checkpoint,
                                   num_classes=args.num_classes,
                                   factory_module=human_models)
    vis = P.colorize_classes(class_map)

    import cv2
    save_img = vis if vis.ndim == 2 else cv2.cvtColor(vis,
                                                      cv2.COLOR_RGB2BGR)
    cv2.imwrite(args.save, save_img)
    print(f"saved {args.save}")


if __name__ == "__main__":
    main()
