"""SAM2 (Hiera) encoder distillation training entry (14.x stage 1).

Parity with /root/reference/tools/
train_video_interactive_segmentation_distill_encoder_model.py: frozen
Hiera teacher encoder -> Hiera/DINOv3 student, MSE on the /16 FPN feature
maps. The loss-fn shape is identical to the SAM encoder distill entry; the
model comes from video_interactive_segmentation.distill_model.
"""

import argparse
import os
import sys

BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(BASE_DIR)

from train_interactive_segmentation_distill_encoder_model import (  # noqa: E402
    build_loss_fn)


def parse_args():
    parser = argparse.ArgumentParser(
        description="train SAM2 encoder distill model")
    parser.add_argument("--work-dir", type=str, required=True)
    return parser.parse_args()


def main():
    args = parse_args()
    from simpleaicv_pytorch_training_examples_tpu.engine.runner import (
        run_training)
    from simpleaicv_pytorch_training_examples_tpu.utils import (
        load_config_from_work_dir)

    config = load_config_from_work_dir(args.work_dir, "train_config")
    if getattr(config, "freeze_teacher", True):
        name, params_dict = config.optimizer
        params_dict = dict(params_dict)
        sub = dict(params_dict.get("sub_layer_lr") or {})
        sub["teacher"] = 0.0
        params_dict["sub_layer_lr"] = sub
        config.optimizer = (name, params_dict)
    return run_training(config, args.work_dir,
                        build_loss_fn=build_loss_fn,
                        higher_is_better=False)


if __name__ == "__main__":
    main()
