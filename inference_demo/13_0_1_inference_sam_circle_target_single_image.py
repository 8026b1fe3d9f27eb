"""Single-image SAM circle-prompt segmentation inference demo.

Parity with /root/reference/gradio_demo/13.0.1.gradio_sam_circle_target_single_image.py (the
reference ships these as gradio apps; the CLI here shares the same
predictor — see gradio_demo/ for the UI wrapper).

Usage: python inference_demo/13_0_1_inference_sam_circle_target_single_image.py \
           --image path.jpg [--network sam_b] [--checkpoint ckpt]
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
                             "interactive_segmentation", "sample_0.png"))
    parser.add_argument("--network", default="sam_b")
    parser.add_argument("--checkpoint", default="")
    parser.add_argument("--save", default="out.png")
    parser.add_argument('--circle', default='512,512,64',
                        help='cx,cy,radius')
    args = parser.parse_args()

    image = P.load_image(args.image)
    # circle prompt = its center as a positive point plus 4 cardinal
    # points on the circle (the reference samples points from the circle)
    cx, cy, r = [float(v) for v in args.circle.split(',')]
    points = [[cx, cy], [cx - r / 2, cy], [cx + r / 2, cy],
              [cx, cy - r / 2], [cx, cy + r / 2]]
    mask = P.predict_sam(image, points, args.network, args.checkpoint)
    vis = P.overlay_mask(image.astype('uint8'), mask)

    import cv2
    save_img = vis if vis.ndim == 2 else cv2.cvtColor(vis,
                                                      cv2.COLOR_RGB2BGR)
    cv2.imwrite(args.save, save_img)
    print(f"saved {args.save}")


if __name__ == "__main__":
    main()
