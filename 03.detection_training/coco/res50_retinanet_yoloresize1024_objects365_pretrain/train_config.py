"""ResNet50-RetinaNet / COCO2017, yolo-style 1024 resize.

Mirrors /root/reference/03.detection_training/coco/res50_retinanet_yoloresize1024_objects365_pretrain/
res50_retinanet_yoloresize1024/train_config.py (AdamW 1e-4, MultiStep
[8,12], 13ep, bs32). Target: COCO mAP 36.893 (BASELINE.md).
"""

import os
import sys

BASE_DIR = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
sys.path.append(BASE_DIR)

from tools.path import COCO2017_path, pretrained_models_path

from simpleaicv_pytorch_training_examples_tpu.detection import models
from simpleaicv_pytorch_training_examples_tpu.detection import losses
from simpleaicv_pytorch_training_examples_tpu.detection import decode
from simpleaicv_pytorch_training_examples_tpu.detection.datasets.cocodataset import CocoDetection
from simpleaicv_pytorch_training_examples_tpu.detection.common import (
    RandomHorizontalFlip, RandomCrop, RandomTranslate, DetectionResize,
    Normalize, DetectionCollater, load_state_dict)
from simpleaicv_pytorch_training_examples_tpu.data import Compose


class config:
    network = "resnet50_retinanet"
    num_classes = 80
    input_image_size = [1024, 1024]

    backbone_pretrained_path = ""
    model = models.__dict__[network](**{
        "backbone_pretrained_path": backbone_pretrained_path,
        "num_classes": num_classes,
    })

    # objects365-pretrained checkpoint (03.detection_training/objects365)
    trained_model_path = os.path.join(
        pretrained_models_path, "retinanet_train_on_objects365_2020/resnet50_retinanet_obj365.pth")
    load_state_dict(trained_model_path, model)

    train_criterion = losses.__dict__["RetinaLoss"](**{
        "areas": [[32, 32], [64, 64], [128, 128], [256, 256], [512, 512]],
        "ratios": [0.5, 1, 2],
        "scales": [2**0, 2**(1.0 / 3.0), 2**(2.0 / 3.0)],
        "strides": [8, 16, 32, 64, 128],
        "alpha": 0.25,
        "gamma": 2,
        "beta": 1.0 / 9.0,
        "cls_loss_weight": 1.0,
        "box_loss_weight": 1.0,
        "box_loss_type": "SmoothL1",
    })
    test_criterion = train_criterion

    decoder = decode.__dict__["RetinaDecoder"](**{
        "areas": [[32, 32], [64, 64], [128, 128], [256, 256], [512, 512]],
        "ratios": [0.5, 1, 2],
        "scales": [2**0, 2**(1.0 / 3.0), 2**(2.0 / 3.0)],
        "strides": [8, 16, 32, 64, 128],
        "max_object_num": 100,
        "min_score_threshold": 0.05,
        "topn": 1000,
        "nms_type": "python_nms",
        "nms_threshold": 0.5,
    })

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
    train_collater = DetectionCollater(resize=input_image_size[0],
                                       resize_type="yolo_style",
                                       max_annots_num=100)
    test_collater = DetectionCollater(resize=input_image_size[0],
                                      resize_type="yolo_style",
                                      max_annots_num=100)

    seed = 0
    batch_size = 32
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
        "MultiStepLR",
        {
            "warm_up_epochs": 0,
            "gamma": 0.1,
            "milestones": [8, 12],
        },
    )

    epochs = 13
    print_interval = 100

    eval_type = "COCO"
    eval_epoch = [1, 3, 5, 8, 10, 12, 13]
    save_model_metric = "IoU=0.50:0.95,area=all,maxDets=100,mAP"

    sync_bn = False
    use_amp = True
    use_compile = False
    use_ema_model = False
    ema_model_decay = 0.9999
