"""ConvFormer-M36-SOLOv2 / COCO instance segmentation, yolo-1024.

Mirrors /root/reference/05.instance_segmentation_training/coco/
convformerm36_solov2_yoloresize1024 (AdamW 1e-4, Cosine warmup 1, 39ep, bs64).
Target segm mAP 37.661 (BASELINE.md).
"""

import os
import sys

BASE_DIR = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
sys.path.append(BASE_DIR)

from tools.path import COCO2017_path

from simpleaicv_pytorch_training_examples_tpu.instance_segmentation import (
    models, losses, decode)
from simpleaicv_pytorch_training_examples_tpu.instance_segmentation.datasets.cocodataset import CocoInstanceSegmentation
from simpleaicv_pytorch_training_examples_tpu.instance_segmentation.common import (
    InstanceSegmentationResize, RandomHorizontalFlip, Normalize,
    SOLOV2InstanceSegmentationCollater, load_state_dict)
from simpleaicv_pytorch_training_examples_tpu.data import Compose


class config:
    network = "convformerm36_solov2"
    num_classes = 80
    input_image_size = 1024

    backbone_pretrained_path = ""
    model = models.__dict__[network](**{
        "backbone_pretrained_path": backbone_pretrained_path,
        "num_classes": num_classes,
    })

    trained_model_path = ""
    load_state_dict(trained_model_path, model)

    train_criterion = losses.SOLOV2Loss()
    decoder = decode.SOLOV2Decoder()

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
                                       resize_type="yolo_style"),
            Normalize(),
        ]))
    train_collater = SOLOV2InstanceSegmentationCollater(
        resize=input_image_size, resize_type="yolo_style")
    test_collater = SOLOV2InstanceSegmentationCollater(
        resize=input_image_size, resize_type="yolo_style")

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

    epochs = 39
    print_interval = 100
    eval_epoch = [13, 26, 35, 39]

    use_amp = True
    use_ema_model = False
