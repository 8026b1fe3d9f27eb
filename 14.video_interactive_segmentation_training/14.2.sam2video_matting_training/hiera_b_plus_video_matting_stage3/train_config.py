"""SAM2 hiera-b+ video matting training. Stage 3: frame_num=16.

Mirrors /root/reference/14.video_interactive_segmentation_training/
14.2.sam2video_matting_training recipes: memory-conditioned tracking with
the matting triple per frame, SAM2MattingLoss (trimap/alpha family).
"""

import os
import sys

BASE_DIR = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
sys.path.append(BASE_DIR)

from tools.path import (human_matting_dataset_path,
                        video_interactive_segmentation_dataset_path)

from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.models.segment_anything2_matting import (
    sam2_hiera_base_plus_video_matting)
from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.losses_matting import (
    SAM2MattingLoss)
from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.datasets.sam2_video_matting_dataset import (
    SAM2VideoMattingDataset, SAM2VideoMattingBatchCollater)
from simpleaicv_pytorch_training_examples_tpu.classification.common import (
    load_state_dict)


class config:
    network = "sam2_hiera_base_plus_video_matting"
    input_image_size = 1024
    frame_nums = 4

    model = sam2_hiera_base_plus_video_matting(
        image_size=input_image_size, use_gradient_checkpoint=True,
        # fused pallas memory attention: 1.3-1.6x over XLA at d=256 + O(N) score memory
        use_flash_attention=True,
                                       head_dim_padding=64,
        memory_cond_slots=2)

    trained_model_path = ""
    load_state_dict(trained_model_path, model)

    train_criterion = SAM2MattingLoss()

    # composite sources: VideoMatte-style fg/alpha videos composited over
    # background video clips + image matting sets as static clips
    # (reference sam2_video_matting_dataset.py video-matting composites)
    train_dataset = SAM2VideoMattingDataset(
        video_interactive_segmentation_dataset_path,
        set_name_list=["video_matting", "VideoMatte240K"],
        set_type="train",
        use_background_video_prob={"VideoMatte240K": 1.0},
        background_root_dir=video_interactive_segmentation_dataset_path
        + "/background_videos",
        image_root_dir=human_matting_dataset_path,
        image_set_name=["DIS5K", "AM2K"],
        frame_nums=frame_nums)
    test_dataset = None
    # condition frames (frame 0 + up to 1 random extra) with per-frame
    # prompts synthesized from the binarized alpha
    train_collater = SAM2VideoMattingBatchCollater(
        resize=input_image_size, frame_nums=frame_nums, n_points=2,
        prompt_probs=(0.5, 0.25, 0.25), extra_cond_frames=1)

    seed = 0
    batch_size = 8
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
