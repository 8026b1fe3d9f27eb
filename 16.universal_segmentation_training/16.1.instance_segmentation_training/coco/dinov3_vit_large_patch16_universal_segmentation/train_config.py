"""DINOv3-ViT-L universal segmentation / COCO instance (512^2).

Mirrors /root/reference/16.universal_segmentation_training/
16.1.instance_segmentation_training COCO recipe. Target segm mAP 37.387
class of numbers (BASELINE.md 16.x rows).
"""

import os
import sys

BASE_DIR = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))))
sys.path.append(BASE_DIR)

from tools.path import COCO2017_path

from simpleaicv_pytorch_training_examples_tpu.universal_segmentation import (
    models, segmentation_losses, segmentation_decode)
from simpleaicv_pytorch_training_examples_tpu.universal_segmentation.datasets import (
    UniversalInstanceCollater)
from simpleaicv_pytorch_training_examples_tpu.instance_segmentation.datasets.cocodataset import (
    CocoInstanceSegmentation)
from simpleaicv_pytorch_training_examples_tpu.instance_segmentation.common import (
    InstanceSegmentationResize, RandomHorizontalFlip, Normalize,
    load_state_dict)
from simpleaicv_pytorch_training_examples_tpu.data import Compose


class config:
    network = "dinov3_vit_large_patch16_universal_segmentation"
    num_classes = 81  # 80 things + no-object
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
        num_classes=num_classes, mode="instance")

    train_dataset = CocoInstanceSegmentation(
        COCO2017_path, set_name="train2017",
        transform=Compose([
            RandomHorizontalFlip(prob=0.5),
            InstanceSegmentationResize(resize=input_image_size,
                                       resize_type="yolo_style",
                                       multi_scale=True,
                                       multi_scale_range=[0.8, 1.0]),
            Normalize(),
        ]))
    test_dataset = CocoInstanceSegmentation(
        COCO2017_path, set_name="val2017",
        transform=Compose([
            InstanceSegmentationResize(resize=input_image_size,
                                       resize_type="yolo_style",
                                       multi_scale=False),
            Normalize(),
        ]))
    train_collater = UniversalInstanceCollater(resize=input_image_size,
                                               max_instances=32)
    test_collater = UniversalInstanceCollater(resize=input_image_size,
                                              max_instances=32)

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
