"""Single-image OCR text recognition inference demo.

Parity with /root/reference/gradio_demo/09.gradio_ocr_text_recognition_single_image.py (the
reference ships these as gradio apps; the CLI here shares the same
predictor — see gradio_demo/ for the UI wrapper).

Usage: python inference_demo/09_inference_ocr_text_recognition_single_image.py \
           --image path.jpg [--network resnet50_ctc_model] [--checkpoint ckpt]
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
                             "text_recognition", "sample_0.png"))
    parser.add_argument("--network", default="resnet50_ctc_model")
    parser.add_argument("--checkpoint", default="")
    parser.add_argument("--save", default="out.png")
    parser.add_argument('--chars-file', default=None)
    args = parser.parse_args()

    image = P.load_image(args.image)
    text = P.predict_text_recognition(image, args.network,
                                      args.checkpoint,
                                      chars_file=args.chars_file)
    print('recognized:', text)
    vis = image.astype('uint8')

    import cv2
    save_img = vis if vis.ndim == 2 else cv2.cvtColor(vis,
                                                      cv2.COLOR_RGB2BGR)
    cv2.imwrite(args.save, save_img)
    print(f"saved {args.save}")


if __name__ == "__main__":
    main()
