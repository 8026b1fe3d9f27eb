"""Single-image SAM point-prompt segmentation inference demo.

Parity with /root/reference/gradio_demo/13.0.0.gradio_sam_point_target_single_image.py (the
reference ships these as gradio apps; the CLI here shares the same
predictor — see gradio_demo/ for the UI wrapper).

Usage: python inference_demo/13_0_0_inference_sam_point_target_single_image.py \
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
    parser.add_argument('--points', nargs='+', default=['512,512'],
                        help="x,y point prompts")
    args = parser.parse_args()

    image = P.load_image(args.image)
    points = [[float(v) for v in p.split(',')] for p in args.points]
    mask = P.predict_sam(image, points, args.network, args.checkpoint)
    vis = P.overlay_mask(image.astype('uint8'), mask)

    import cv2
    save_img = vis if vis.ndim == 2 else cv2.cvtColor(vis,
                                                      cv2.COLOR_RGB2BGR)
    cv2.imwrite(args.save, save_img)
    print(f"saved {args.save}")


if __name__ == "__main__":
    main()
