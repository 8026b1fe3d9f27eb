"""ConvFormer-M36-DBNet OCR text detection (1024^2, bs64, 100ep).

Mirrors /root/reference/08.ocr_text_detection_training/convformerm36_dbnet/
train_config.py. Target precision/recall/f1 92.35/87.13/89.66
(BASELINE.md).
"""

import os
import sys

BASE_DIR = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.append(BASE_DIR)

from tools.path import text_detection_dataset_path

from simpleaicv_pytorch_training_examples_tpu.text_detection import (
    models, losses, decode)
from simpleaicv_pytorch_training_examples_tpu.text_detection.datasets.text_detection_dataset import TextDetection
from simpleaicv_pytorch_training_examples_tpu.text_detection.common import (
    YoloStyleResize, RandomHorizontalFlip, Normalize,
    TextDetectionCollater, load_state_dict)
from simpleaicv_pytorch_training_examples_tpu.data import Compose


class config:
    network = "convformerm36_dbnet"
    input_image_size = 1024

    backbone_pretrained_path = ""
    model = models.__dict__[network](**{
        "backbone_pretrained_path": backbone_pretrained_path,
    })

    trained_model_path = ""
    load_state_dict(trained_model_path, model)

    train_criterion = losses.DBNetLoss(probability_weight=1,
                                       threshold_weight=5,
                                       binary_weight=1)
    decoder = decode.DBNetDecoder()

    train_dataset = TextDetection(
        text_detection_dataset_path,
        set_name_list=["ICDAR2017RCTW", "ICDAR2019ART", "ICDAR2019LSVT",
                       "ICDAR2019MLT"],
        set_type="train",
        transform=Compose([
            YoloStyleResize(resize=input_image_size, multi_scale=True,
                            multi_scale_range=[0.8, 1.0]),
            RandomHorizontalFlip(prob=0.5),
            Normalize(),
        ]))
    test_dataset = None
    train_collater = TextDetectionCollater(resize=input_image_size)

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
    print_interval = 100

    use_amp = True
    use_ema_model = False
