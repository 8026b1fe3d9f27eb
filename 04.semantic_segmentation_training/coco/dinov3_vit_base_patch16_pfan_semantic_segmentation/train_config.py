"""DINOv3-ViT-B/16-PFAN / COCO2017 semantic segmentation.

Mirrors /root/reference/04.semantic_segmentation_training/coco/
dinov3_vit_base_patch16_pfan_semantic_segmentation/train_config.py (AdamW 1e-4, Cosine
1-epoch warmup, 100ep, bs32, 512^2).
"""

import os
import sys

BASE_DIR = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
sys.path.append(BASE_DIR)

from tools.path import COCO2017_path

from simpleaicv_pytorch_training_examples_tpu.semantic_segmentation import (
    models, losses)
from simpleaicv_pytorch_training_examples_tpu.semantic_segmentation.datasets.cocosemanticsegmentationdataset import CocoSemanticSegmentation
from simpleaicv_pytorch_training_examples_tpu.semantic_segmentation.common import (
    YoloStyleResize, RandomHorizontalFlip, Normalize,
    SemanticSegmentationCollater, load_state_dict)
from simpleaicv_pytorch_training_examples_tpu.data import Compose


class config:
    network = "dinov3_vit_base_patch16_pfan_semantic_segmentation"
    num_classes = 81  # 80 + background
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

    train_dataset = CocoSemanticSegmentation(
        COCO2017_path, set_name="train2017",
        transform=Compose([
            YoloStyleResize(resize=input_image_size, multi_scale=True,
                            multi_scale_range=[0.8, 1.0]),
            RandomHorizontalFlip(prob=0.5),
            Normalize(),
        ]))
    test_dataset = CocoSemanticSegmentation(
        COCO2017_path, set_name="val2017",
        transform=Compose([
            YoloStyleResize(resize=input_image_size),
            Normalize(),
        ]))
    train_collater = SemanticSegmentationCollater(resize=input_image_size)
    test_collater = SemanticSegmentationCollater(resize=input_image_size)

    seed = 0
    batch_size = 64
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
    print_interval = 100

    use_amp = True
    use_ema_model = False
