"""DINOv3-ViT-L universal segmentation / human parsing (512^2).

Mirrors /root/reference/16.universal_segmentation_training/
16.6.human_parsing_training recipe: per-class instance stacks from the parsing label maps
(UniversalSemanticCollater).
"""

import os
import sys

BASE_DIR = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
sys.path.append(BASE_DIR)

from tools.path import human_parsing_dataset_path

from simpleaicv_pytorch_training_examples_tpu.universal_segmentation import (
    models, segmentation_losses, segmentation_decode)
from simpleaicv_pytorch_training_examples_tpu.universal_segmentation.datasets import (
    UniversalSemanticCollater)
from simpleaicv_pytorch_training_examples_tpu.human_parsing.datasets.human_parsing_dataset import (
    HumanParsingDataset)
from simpleaicv_pytorch_training_examples_tpu.semantic_segmentation.common import (
    YoloStyleResize, RandomHorizontalFlip, Normalize, load_state_dict)
from simpleaicv_pytorch_training_examples_tpu.data import Compose


class config:
    network = "dinov3_vit_large_patch16_universal_segmentation"
    num_classes = 21  # parsing classes + no-object
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

    train_criterion = segmentation_losses.Mask2FormerLoss(
        num_classes=num_classes)
    decoder = segmentation_decode.UniversalSegmentationDecoder(
        num_classes=num_classes, mode="semantic")

    train_dataset = HumanParsingDataset(
        human_parsing_dataset_path, set_name_list=("LIP",), set_type="train",
        transform=Compose([
            YoloStyleResize(resize=input_image_size, multi_scale=True,
                            multi_scale_range=[0.8, 1.0]),
            RandomHorizontalFlip(prob=0.5),
            Normalize(),
        ]))
    test_dataset = HumanParsingDataset(
        human_parsing_dataset_path, set_name_list=("LIP",), set_type="val",
        transform=Compose([
            YoloStyleResize(resize=input_image_size),
            Normalize(),
        ]))
    train_collater = UniversalSemanticCollater(resize=input_image_size)
    test_collater = UniversalSemanticCollater(resize=input_image_size)

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
