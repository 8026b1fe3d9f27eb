"""DINOv3-ViT-L universal matting / human matting datasets (512^2).

Mirrors /root/reference/16.universal_segmentation_training/
16.3.human_matting_training/dinov3_vit_large_patch16_universal_matting/
train_config.py. Target SAD 30.428 class of numbers (BASELINE.md 16.x
matting rows).
"""

import os
import sys

BASE_DIR = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
sys.path.append(BASE_DIR)

from tools.path import human_matting_dataset_path

from simpleaicv_pytorch_training_examples_tpu.universal_segmentation import (
    models)
from simpleaicv_pytorch_training_examples_tpu.human_matting import losses
from simpleaicv_pytorch_training_examples_tpu.human_matting.datasets.human_matting_dataset import (
    HumanMattingDataset)
from simpleaicv_pytorch_training_examples_tpu.human_matting.common import (
    YoloStyleResize, RandomHorizontalFlip, Normalize,
    HumanMattingCollater, load_state_dict)
from simpleaicv_pytorch_training_examples_tpu.data import Compose


class config:
    network = "dinov3_vit_large_patch16_universal_matting"
    num_classes = 2  # background / foreground queries
    input_image_size = 512

    backbone_pretrained_path = ""
    model = models.__dict__[network](**{
        "backbone_pretrained_path": backbone_pretrained_path,
        "image_size": input_image_size,
        "num_classes": num_classes,
        "use_gradient_checkpoint": True,
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
    }
    loss_ratio = {k: 1.0 for k in train_criterion}

    train_dataset = HumanMattingDataset(
        human_matting_dataset_path,
        set_name_list=("Deep_Automatic_Portrait_Matting",),
        set_type="train",
        transform=Compose([
            YoloStyleResize(resize=input_image_size, multi_scale=True,
                            multi_scale_range=[0.8, 1.0]),
            RandomHorizontalFlip(prob=0.5),
            Normalize(),
        ]))
    test_dataset = HumanMattingDataset(
        human_matting_dataset_path,
        set_name_list=("Deep_Automatic_Portrait_Matting",),
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

    sync_bn = False
    use_amp = True
    use_compile = False
    use_ema_model = False
    ema_model_decay = 0.9999
