"""SAM2 hiera-b+ stage-1 video training (frame_nums=1).

Mirrors /root/reference/14.video_interactive_segmentation_training staged
recipe (frames 1 -> 8 -> 16, RESULTS.md:485-493); stage 2/3 work dirs
differ only in frame_nums and trained_model_path. Target stage1 loss
0.1315 (BASELINE.md).
"""

import os
import sys

BASE_DIR = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
sys.path.append(BASE_DIR)

from tools.path import video_interactive_segmentation_dataset_path

from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.models.segment_anything2.sam2 import sam2_hiera_base_plus_video
from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation import losses
from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.datasets.sam2_video_segmentation_dataset import (
    SAM2VideoSegmentationDataset, SAM2VideoCollater)
from simpleaicv_pytorch_training_examples_tpu.classification.common import (
    load_state_dict)


class config:
    network = "sam2_hiera_base_plus_video"
    input_image_size = 1024
    frame_nums = 1

    # use_scan: the tracked-frame loop compiles once and is shared across
    # frames (verified bit-identical to the python loop) — matters at the
    # stage-2/3 frame_nums=8/16 recipes
    model = sam2_hiera_base_plus_video(image_size=input_image_size,
                                       use_gradient_checkpoint=True,
                                       # stride-4/8 FPN skips into the
                                       # decoder upscaling (reference
                                       # conv_s0/conv_s1)
                                       use_high_res_features=True,
                                       use_scan=True,
                                       # keep param shapes identical to
                                       # the later flash stages (qkv/proj
                                       # head width 64; exact, see
                                       # MultiScaleAttention)
                                       head_dim_padding=64)

    trained_model_path = ""
    load_state_dict(trained_model_path, model)

    train_criterion = losses.SAM2Loss()

    train_dataset = SAM2VideoSegmentationDataset(
        video_interactive_segmentation_dataset_path,
        set_name_list=["sa_v"],
        set_type="train",
        frame_nums=frame_nums)
    test_dataset = None
    train_collater = SAM2VideoCollater(resize=input_image_size,
                                       frame_nums=frame_nums)

    seed = 0
    batch_size = 64
    num_workers = 32
    accumulation_steps = 1

    optimizer = (
        "AdamW",
        {
            "lr": 5e-5,
            "global_weight_decay": False,
            "weight_decay": 1e-4,
            "no_weight_decay_layer_name_list": [],
        },
    )

    scheduler = (
        "CosineLR",
        {
            "warm_up_epochs": 1,
            "min_lr": 1e-6,
        },
    )

    epochs = 20
    print_interval = 50
    save_interval = 1

    use_amp = True
    use_ema_model = False
