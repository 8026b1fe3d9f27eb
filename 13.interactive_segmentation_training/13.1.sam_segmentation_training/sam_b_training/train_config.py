"""SAM-B interactive segmentation training.

Mirrors /root/reference/13.interactive_segmentation_training/
13.1.sam_b_training (1024^2, bs160, 2ep, AdamW, iterative point prompting
with decoder_iters=4). Target train loss 0.0954 (BASELINE.md).
"""

import os
import sys

BASE_DIR = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
sys.path.append(BASE_DIR)

from tools.path import interactive_segmentation_dataset_path

from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation.models.segment_anything.sam import sam_b
from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation import losses
from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation.datasets.sam_segmentation_dataset import (
    SamSegmentationDataset, SAMCollater)
from simpleaicv_pytorch_training_examples_tpu.classification.common import (
    load_state_dict)


class config:
    network = "sam_b"
    input_image_size = 1024

    model = sam_b(image_size=input_image_size,
                  use_gradient_checkpoint=True,
                  # pallas flash for the 4096-token global blocks: 3.3x
                  # fwd+bwd on v5e; bit-identical XLA fallback off-TPU
                  use_flash_attention=True)
    # at small per-device batch, remat_policy="dots_saveable" keeps MXU
    # outputs resident (+4.8% step, ~0.68 GB/img HBM — see
    # bench_sam_train.py); at this global batch the default full
    # recompute is the right trade

    trained_model_path = ""
    load_state_dict(trained_model_path, model)

    train_criterion = losses.SAMLoss(
        alpha=0.25, gamma=2, focal_loss_weight=20, dice_loss_weight=1,
        iou_predict_loss_weight=1, supervise_all_iou=True,
        mask_threshold=0.0)

    train_dataset = SamSegmentationDataset(
        interactive_segmentation_dataset_path,
        set_name_list=["sa_000020", "sa_000021", "sa_000022"],
        set_type="train")
    test_dataset = None
    train_collater = SAMCollater(resize=input_image_size, n_points=9,
                                 prompt_probs=(0.5, 0.25, 0.25))

    decoder_iters = 4

    seed = 0
    batch_size = 160
    num_workers = 32
    accumulation_steps = 1

    optimizer = (
        "AdamW",
        {
            "lr": 1e-4,
            "global_weight_decay": False,
            "weight_decay": 1e-4,
            "no_weight_decay_layer_name_list": [],
        },
    )

    scheduler = (
        "CosineLR",
        {
            "warm_up_epochs": 0,
            "min_lr": 1e-6,
        },
    )

    epochs = 2
    print_interval = 50
    save_interval = 1

    use_amp = True
    use_ema_model = False
