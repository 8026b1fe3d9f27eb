"""DINOv3-ViT-B/16-PFAN human matting (1024^2, bs32, 100ep).

Mirrors /root/reference/07.human_matting_training/dinov3_vit_base_patch16_pfan_matting/
train_config.py. Target IoU 0.9823 / SAD 6.55 (BASELINE.md).
"""

import os
import sys

BASE_DIR = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.append(BASE_DIR)

from tools.path import human_matting_dataset_path

from simpleaicv_pytorch_training_examples_tpu.human_matting import (
    models, losses)
from simpleaicv_pytorch_training_examples_tpu.human_matting.datasets.human_matting_dataset import HumanMattingDataset
from simpleaicv_pytorch_training_examples_tpu.human_matting.common import (
    YoloStyleResize, RandomHorizontalFlip, Normalize, HumanMattingCollater,
    load_state_dict)
from simpleaicv_pytorch_training_examples_tpu.data import Compose


class config:
    network = "dinov3_vit_base_patch16_pfan_matting"
    input_image_size = 1024

    backbone_pretrained_path = ""
    model = models.__dict__[network](**{
        "backbone_pretrained_path": backbone_pretrained_path,
    })

    trained_model_path = ""
    load_state_dict(trained_model_path, model)

    train_criterion = {
        "GlobalTrimapCELoss": losses.GlobalTrimapCELoss(),
        "GloabelTrimapIouLoss": losses.GloabelTrimapIouLoss(),
        "LocalAlphaLoss": losses.LocalAlphaLoss(),
        "LocalLaplacianLoss": losses.LocalLaplacianLoss(),
        "FusionAlphaLoss": losses.FusionAlphaLoss(),
        "FusionLaplacianLoss": losses.FusionLaplacianLoss(),
        "CompositionLoss": losses.CompositionLoss(),
    }
    loss_ratio = {k: 1.0 for k in train_criterion}

    train_dataset = HumanMattingDataset(
        human_matting_dataset_path,
        set_name_list=["P3M10K", "Human2K"],
        set_type="train",
        transform=Compose([
            YoloStyleResize(resize=input_image_size),
            RandomHorizontalFlip(prob=0.5),
            Normalize(),
        ]))
    test_dataset = HumanMattingDataset(
        human_matting_dataset_path,
        set_name_list=["P3M10K"],
        set_type="val",
        transform=Compose([
            YoloStyleResize(resize=input_image_size),
            Normalize(),
        ]))
    train_collater = HumanMattingCollater(resize=input_image_size)
    test_collater = HumanMattingCollater(resize=input_image_size)

    seed = 0
    batch_size = 32
    num_workers = 16
    accumulation_steps = 1

    optimizer = (
        "AdamW",
        {
            "lr": 1e-4,
            "global_weight_decay": False,
            "weight_decay": 1e-3,
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

    epochs = 100
    print_interval = 50

    use_amp = True
    use_ema_model = False
