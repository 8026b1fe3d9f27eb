"""Single-image instance segmentation inference demo.

Parity with /root/reference/gradio_demo/05.gradio_instance_segment_single_image.py (the
reference ships these as gradio apps; the CLI here shares the same
predictor — see gradio_demo/ for the UI wrapper).

Usage: python inference_demo/05_inference_instance_segment_single_image.py \
           --image path.jpg [--network resnet50_solov2] [--checkpoint ckpt]
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
                             "instance_segmentation", "sample_0.png"))
    parser.add_argument("--network", default="resnet50_solov2")
    parser.add_argument("--checkpoint", default="")
    parser.add_argument("--save", default="out.png")
    args = parser.parse_args()

    image = P.load_image(args.image)
    scores, classes, masks = P.predict_instance(
        image, args.network, args.checkpoint)
    vis = image.astype('uint8')
    import numpy as np
    for i in range(len(scores)):
        color = P.palette()[int(classes[i]) % 256].tolist()
        import cv2
        m = cv2.resize(masks[i], (image.shape[1], image.shape[0]),
                       interpolation=cv2.INTER_NEAREST)
        vis = P.overlay_mask(vis, m, color)
    print(f'{len(scores)} instances')

    import cv2
    save_img = vis if vis.ndim == 2 else cv2.cvtColor(vis,
                                                      cv2.COLOR_RGB2BGR)
    cv2.imwrite(args.save, save_img)
    print(f"saved {args.save}")


if __name__ == "__main__":
    main()
