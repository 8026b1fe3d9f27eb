"""DINOv3-ViT-L universal INSTANCE matting / HIM2K-style datasets (512^2).

Mirrors /root/reference/16.universal_segmentation_training/
16.4.human_instance_matting_training recipe: Hungarian per-query alpha
matching (UniversalInstanceMattingLoss) over per-instance alphas.
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
from simpleaicv_pytorch_training_examples_tpu.universal_segmentation.matting_losses import (
    UniversalInstanceMattingLoss)
from simpleaicv_pytorch_training_examples_tpu.universal_segmentation.datasets import (
    HumanInstanceMattingDataset, UniversalInstanceMattingCollater)
from simpleaicv_pytorch_training_examples_tpu.classification.common import (
    load_state_dict)


class config:
    network = "dinov3_vit_large_patch16_universal_matting"
    num_classes = 2  # person + no-object
    input_image_size = 512
    instance_matting = True

    backbone_pretrained_path = ""
    model = models.__dict__[network](**{
        "backbone_pretrained_path": backbone_pretrained_path,
        "image_size": input_image_size,
        "num_classes": num_classes,
        "use_gradient_checkpoint": True,
    })

    trained_model_path = ""
    load_state_dict(trained_model_path, model)

    train_criterion = UniversalInstanceMattingLoss(num_classes=num_classes)

    train_dataset = HumanInstanceMattingDataset(
        human_matting_dataset_path, set_name_list=("HIM2K", "I-HIM50K"),
        set_type="train")
    test_dataset = None
    train_collater = UniversalInstanceMattingCollater(
        resize=input_image_size, max_instances=8)

    seed = 0
    batch_size = 16
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
