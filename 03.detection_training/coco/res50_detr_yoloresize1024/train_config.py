"""ResNet50-DETR / COCO (1024^2 yolo resize).

Mirrors /root/reference/03.detection_training/coco/
res50_detr_yoloresize1024/train_config.py. Target mAP 35.773
(BASELINE.md). DETR consumes the cxcywh-normalized `scaled_annots`
(annots_key below).
"""

import os
import sys

BASE_DIR = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
sys.path.append(BASE_DIR)

from tools.path import COCO2017_path

from simpleaicv_pytorch_training_examples_tpu.detection import (
    models, losses, decode)
from simpleaicv_pytorch_training_examples_tpu.detection.datasets.cocodataset import CocoDetection
from simpleaicv_pytorch_training_examples_tpu.detection.common import (
    RandomHorizontalFlip, RandomCrop, RandomTranslate, DetectionResize,
    Normalize, DETRDetectionCollater, load_state_dict)
from simpleaicv_pytorch_training_examples_tpu.data import Compose


class config:
    network = "resnet50_detr"
    num_classes = 80
    input_image_size = [1024, 1024]
    annots_key = "scaled_annots"

    backbone_pretrained_path = ""
    model = models.__dict__[network](**{
        "backbone_pretrained_path": backbone_pretrained_path,
        "num_classes": num_classes,
    })

    trained_model_path = ""
    load_state_dict(trained_model_path, model)

    train_criterion = losses.DETRLoss(num_classes=num_classes)
    test_criterion = train_criterion
    decoder = decode.DETRDecoder(num_classes=num_classes,
                                 max_object_num=100)

    train_dataset = CocoDetection(
        COCO2017_path, set_name="train2017",
        transform=Compose([
            RandomHorizontalFlip(prob=0.5),
            RandomCrop(prob=0.5),
            RandomTranslate(prob=0.5),
            DetectionResize(resize=input_image_size[0], stride=32,
                            resize_type="yolo_style", multi_scale=True,
                            multi_scale_range=[0.8, 1.0]),
            Normalize(),
        ]))
    test_dataset = CocoDetection(
        COCO2017_path, set_name="val2017",
        transform=Compose([
            DetectionResize(resize=input_image_size[0], stride=32,
                            resize_type="yolo_style", multi_scale=False),
            Normalize(),
        ]))
    train_collater = DETRDetectionCollater(resize=input_image_size[0],
                                           resize_type="yolo_style",
                                           max_annots_num=100)
    test_collater = DETRDetectionCollater(resize=input_image_size[0],
                                          resize_type="yolo_style",
                                          max_annots_num=100)

    seed = 0
    batch_size = 64
    num_workers = 32
    accumulation_steps = 1

    optimizer = (
        "AdamW",
        {
            "lr": 1e-4,
            "global_weight_decay": False,
            "weight_decay": 1e-4,
            "no_weight_decay_layer_name_list": [],
            "sub_layer_lr": {"backbone": 1e-5},
        },
    )

    scheduler = (
        "MultiStepLR",
        {
            "warm_up_epochs": 0,
            "gamma": 0.1,
            "milestones": [400],
        },
    )

    epochs = 500
    print_interval = 100
    eval_epochs = 50

    sync_bn = False
    use_amp = True
    use_compile = False
    use_ema_model = False
    ema_model_decay = 0.9999
