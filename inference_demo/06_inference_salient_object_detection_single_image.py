"""Single-image salient object detection inference demo.

Parity with /root/reference/gradio_demo/06.gradio_salient_object_detection_single_image.py (the
reference ships these as gradio apps; the CLI here shares the same
predictor — see gradio_demo/ for the UI wrapper).

Usage: python inference_demo/06_inference_salient_object_detection_single_image.py \
           --image path.jpg [--network resnet50_pfan_segmentation] [--checkpoint ckpt]
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
                             "salient_object_detection", "sample_0.png"))
    parser.add_argument("--network", default="resnet50_pfan_segmentation")
    parser.add_argument("--checkpoint", default="")
    parser.add_argument("--save", default="out.png")
    args = parser.parse_args()

    image = P.load_image(args.image)
    prob = P.predict_salient_or_matting(image, args.network,
                                        args.checkpoint)
    vis = (prob * 255).astype('uint8')

    import cv2
    save_img = vis if vis.ndim == 2 else cv2.cvtColor(vis,
                                                      cv2.COLOR_RGB2BGR)
    cv2.imwrite(args.save, save_img)
    print(f"saved {args.save}")


if __name__ == "__main__":
    main()
