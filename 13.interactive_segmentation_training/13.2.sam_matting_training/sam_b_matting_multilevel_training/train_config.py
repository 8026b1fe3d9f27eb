"""SAM-B interactive matting training (multilevel: all 4 mask-level
outputs supervised).

Mirrors /root/reference/13.interactive_segmentation_training/
13.2.sam_matting_training/sam_b_matting_multilevel_training: SAMMatting (prompted trimap/alpha
triple) over matting datasets with prompt synthesis from the binarized
alpha.
"""

import os
import sys

BASE_DIR = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
sys.path.append(BASE_DIR)

from tools.path import human_matting_dataset_path

from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation.models.segment_anything_matting import (
    sam_b_matting)
from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation import (
    losses_matting)
from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation.datasets.sam_matting_dataset import (
    SAMMattingDataset, SAMMattingCollater)
from simpleaicv_pytorch_training_examples_tpu.classification.common import (
    load_state_dict)


class config:
    network = "sam_b_matting"
    input_image_size = 1024

    model = sam_b_matting(image_size=input_image_size,
                          use_gradient_checkpoint=True)

    trained_model_path = ""
    load_state_dict(trained_model_path, model)

    train_criterion = {
        "GlobalTrimapCELoss": losses_matting.GlobalTrimapCELoss(),
        "GloabelTrimapIouLoss": losses_matting.GloabelTrimapIouLoss(),
        "LocalAlphaLoss": losses_matting.LocalAlphaLoss(),
        "LocalLaplacianLoss": losses_matting.LocalLaplacianLoss(),
        "FusionAlphaLoss": losses_matting.FusionAlphaLoss(),
        "FusionLaplacianLoss": losses_matting.FusionLaplacianLoss(),
        "CompositionLoss": losses_matting.CompositionLoss(),
    }
    loss_ratio = {k: 1.0 for k in train_criterion}
    # supervise all 4 multimask outputs (reference
    # SAMMattingMultiLevelLoss)
    mask_out_idxs = [0, 1, 2, 3]

    train_dataset = SAMMattingDataset(
        human_matting_dataset_path,
        set_name_list=("Deep_Automatic_Portrait_Matting",),
        set_type="train")
    test_dataset = None
    train_collater = SAMMattingCollater(resize=input_image_size,
                                        n_points=9,
                                        prompt_probs=(0.5, 0.25, 0.25))

    seed = 0
    batch_size = 32
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

    epochs = 30
    print_interval = 50
    save_interval = 1

    use_amp = True
    use_ema_model = False
