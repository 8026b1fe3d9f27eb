"""Single-image face detection inference demo.

Parity with /root/reference/gradio_demo/10.gradio_face_detect_single_image.py (the
reference ships these as gradio apps; the CLI here shares the same
predictor — see gradio_demo/ for the UI wrapper).

Usage: python inference_demo/10_inference_face_detect_single_image.py \
           --image path.jpg [--network resnet50_retinaface] [--checkpoint ckpt]
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
                             "face_detection", "sample_0.png"))
    parser.add_argument("--network", default="resnet50_retinaface")
    parser.add_argument("--checkpoint", default="")
    parser.add_argument("--save", default="out.png")
    args = parser.parse_args()

    image = P.load_image(args.image)
    boxes, scores = P.predict_face_detection(image, args.network,
                                             args.checkpoint)
    vis = P.draw_boxes(image.astype('uint8'), boxes, scores)
    print(f'{len(boxes)} faces')

    import cv2
    save_img = vis if vis.ndim == 2 else cv2.cvtColor(vis,
                                                      cv2.COLOR_RGB2BGR)
    cv2.imwrite(args.save, save_img)
    print(f"saved {args.save}")


if __name__ == "__main__":
    main()
