"""ConvFormer-M36-PFAN human parsing / LIP (20 classes, 512^2).

Mirrors /root/reference/12.human_parsing_training/LIP/
convformerm36_pfan_human_parsing/train_config.py. Target mIoU 46.818
(BASELINE.md).
"""

import os
import sys

BASE_DIR = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
sys.path.append(BASE_DIR)

from tools.path import human_parsing_dataset_path

from simpleaicv_pytorch_training_examples_tpu.human_parsing import (
    models, losses)
from simpleaicv_pytorch_training_examples_tpu.human_parsing.datasets.human_parsing_dataset import (
    HumanParsingDataset)
from simpleaicv_pytorch_training_examples_tpu.semantic_segmentation.common import (
    YoloStyleResize, RandomHorizontalFlip, Normalize,
    SemanticSegmentationCollater, load_state_dict)
from simpleaicv_pytorch_training_examples_tpu.data import Compose


class config:
    network = "convformerm36_pfan_human_parsing"
    num_classes = 20
    input_image_size = 512

    backbone_pretrained_path = ""
    model = models.__dict__[network](**{
        "backbone_pretrained_path": backbone_pretrained_path,
        "num_classes": num_classes,
    })

    trained_model_path = ""
    load_state_dict(trained_model_path, model)

    train_criterion = {"CELoss": losses.CELoss()}
    loss_ratio = {"CELoss": 1.0}
    test_criterion = losses.CELoss()

    train_dataset = HumanParsingDataset(
        human_parsing_dataset_path, set_name_list=("LIP",),
        set_type="train",
        transform=Compose([
            YoloStyleResize(resize=input_image_size, multi_scale=True,
                            multi_scale_range=[0.8, 1.0]),
            RandomHorizontalFlip(prob=0.5),
            Normalize(),
        ]))
    test_dataset = HumanParsingDataset(
        human_parsing_dataset_path, set_name_list=("LIP",),
        set_type="val",
        transform=Compose([
            YoloStyleResize(resize=input_image_size),
            Normalize(),
        ]))
    train_collater = SemanticSegmentationCollater(resize=input_image_size)
    test_collater = SemanticSegmentationCollater(resize=input_image_size)

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
    eval_epochs = 10

    sync_bn = False
    use_amp = True
    use_compile = False
    use_ema_model = False
    ema_model_decay = 0.9999
