"""(multilevel: all 4 mask outputs supervised) SAM2 hiera-b+ stage-3 video training (frame_nums=16).

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

from tools.path import (interactive_segmentation_dataset_path,
                        video_interactive_segmentation_dataset_path)

from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.models.segment_anything2.sam2 import sam2_hiera_base_plus_video
from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation import losses
from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.datasets.sam2_video_segmentation_dataset import (
    SAM2VideoSegmentationDataset, SAM2VideoBatchCollater)
from simpleaicv_pytorch_training_examples_tpu.classification.common import (
    load_state_dict)


class config:
    network = "sam2_hiera_base_plus_video"
    input_image_size = 1024
    frame_nums = 16

    # use_scan: the tracked-frame loop compiles once and is shared across
    # frames (verified bit-identical to the python loop) — matters at the
    # stage-2/3 frame_nums=8/16 recipes
    model = sam2_hiera_base_plus_video(image_size=input_image_size,
                                       use_gradient_checkpoint=True,
                                       use_scan=True,
                                       # stride-4/8 FPN skips into the
                                       # decoder upscaling (reference
                                       # conv_s0/conv_s1)
                                       use_high_res_features=True,
                                       # fused pallas memory attention:
                                       # 1.3-1.6x over XLA at the d=256
                                       # production width and O(N) score
                                       # memory (TPU only; auto-fallback
                                       # elsewhere)
                                       use_flash_attention=True,
                                       head_dim_padding=64,
                                       memory_cond_slots=2)

    # resume from the previous stage checkpoint
    trained_model_path = "../hiera_b_plus_stage2/checkpoints/best"
    load_state_dict(trained_model_path, model)

    train_criterion = losses.SAM2MultiLevelLoss()

    # composite sources: SA-V video shards + SAM image sets mixed in
    # as static 1-frame-repeated clips (reference
    # sam2_video_segmentation_dataset.py:28-120)
    train_dataset = SAM2VideoSegmentationDataset(
        video_root_dir=video_interactive_segmentation_dataset_path,
        video_set_name=["sa_v", "MOSE", "DAVIS2017", "YouTubeVOS2019"],
        video_set_type="train",
        image_root_dir=interactive_segmentation_dataset_path,
        image_set_name=["sa_000020"],
        image_set_type="train",
        image_per_set_image_choose_max_num={"sa_000020": 100000},
        per_video_choose_object_nums=2,
        frame_nums=frame_nums)
    test_dataset = None
    # condition frames (frame 0 + up to 1 random extra), 2 point-
    # iteration frames with in-graph error clicks (reference
    # sam2video_train.py:208-357, 840-911)
    train_collater = SAM2VideoBatchCollater(
        resize=input_image_size, frame_nums=frame_nums, n_points=2,
        prompt_probs=(0.5, 0.25, 0.25), extra_cond_frames=1,
        point_iter_frame_num=2)
    decoder_point_iters = 2

    seed = 0
    batch_size = 4
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
