"""ConvFormer-M36-PFAN salient object detection (1024^2, bs64, 100ep).

Mirrors /root/reference/06.salient_object_detection_training/
convformerm36_pfan_segmentation/train_config.py. Target IoU 0.8444
(BASELINE.md).
"""

import os
import sys

BASE_DIR = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.append(BASE_DIR)

from tools.path import salient_object_detection_dataset_path

from simpleaicv_pytorch_training_examples_tpu.salient_object_detection import (
    models, losses)
from simpleaicv_pytorch_training_examples_tpu.salient_object_detection.datasets.salient_object_detection_dataset import SalientObjectDetectionDataset
from simpleaicv_pytorch_training_examples_tpu.salient_object_detection.common import (
    YoloStyleResize, RandomHorizontalFlip, Normalize,
    SalientObjectDetectionCollater, load_state_dict)
from simpleaicv_pytorch_training_examples_tpu.data import Compose


class config:
    network = "convformerm36_pfan_segmentation"
    input_image_size = 1024

    backbone_pretrained_path = ""
    model = models.__dict__[network](**{
        "backbone_pretrained_path": backbone_pretrained_path,
    })

    trained_model_path = ""
    load_state_dict(trained_model_path, model)

    train_criterion = {
        "BCELoss": losses.BCELoss(),
        "BCEIouloss": losses.BCEIouloss(),
    }
    loss_ratio = {"BCELoss": 1.0, "BCEIouloss": 1.0}

    train_dataset = SalientObjectDetectionDataset(
        salient_object_detection_dataset_path,
        set_name_list=["DIS5K", "HRS10K", "HRSOD", "UHRSD"],
        set_type="train",
        transform=Compose([
            YoloStyleResize(resize=input_image_size, multi_scale=True,
                            multi_scale_range=[0.8, 1.0]),
            RandomHorizontalFlip(prob=0.5),
            Normalize(),
        ]))
    test_dataset = SalientObjectDetectionDataset(
        salient_object_detection_dataset_path,
        set_name_list=["DIS5K"],
        set_type="val",
        transform=Compose([
            YoloStyleResize(resize=input_image_size),
            Normalize(),
        ]))
    train_collater = SalientObjectDetectionCollater(
        resize=input_image_size)
    test_collater = SalientObjectDetectionCollater(resize=input_image_size)

    seed = 0
    batch_size = 64
    num_workers = 32
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
