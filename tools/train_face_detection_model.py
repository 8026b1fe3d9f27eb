"""Face detection (RetinaFace) training entry.

Parity with /root/reference/tools/train_face_detection_model.py +
tools/face_detection_scripts.py.
"""

import argparse
import os
import sys

BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(BASE_DIR)

from train_detection_model import build_loss_fn  # same contract


def parse_args():
    parser = argparse.ArgumentParser(
        description="train face detection model")
    parser.add_argument("--work-dir", type=str, required=True)
    return parser.parse_args()


def main():
    args = parse_args()
    from simpleaicv_pytorch_training_examples_tpu.engine.runner import (
        run_training)
    from simpleaicv_pytorch_training_examples_tpu.utils import (
        load_config_from_work_dir)

    config = load_config_from_work_dir(args.work_dir, "train_config")
    return run_training(config, args.work_dir,
                        build_loss_fn=build_loss_fn,
                        higher_is_better=False)


if __name__ == "__main__":
    main()
