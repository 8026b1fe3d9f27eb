"""ResNet50-RetinaFace / WIDERFace (1024^2, bs16, 100ep).

Mirrors /root/reference/10.face_detection_training/...
resnet50_retinaface config. Target easy/medium/hard AP
0.9375/0.9148/0.7804 (BASELINE.md).
"""

import os
import sys

BASE_DIR = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
sys.path.append(BASE_DIR)

from tools.path import face_detection_dataset_path

from simpleaicv_pytorch_training_examples_tpu.face_detection import (
    models, losses, decode)
from simpleaicv_pytorch_training_examples_tpu.face_detection.datasets.face_detection_dataset import FaceDetectionDataset
from simpleaicv_pytorch_training_examples_tpu.detection.common import (
    RandomHorizontalFlip, RandomCrop, DetectionResize, Normalize,
    DetectionCollater, load_state_dict)
from simpleaicv_pytorch_training_examples_tpu.data import Compose


class config:
    network = "resnet50_retinaface"
    input_image_size = 1024

    backbone_pretrained_path = ""
    model = models.__dict__[network](**{
        "backbone_pretrained_path": backbone_pretrained_path,
    })

    trained_model_path = ""
    load_state_dict(trained_model_path, model)

    train_criterion = losses.RetinaFaceLoss(
        anchor_sizes=[[8, 16, 32], [32, 64, 128], [128, 256, 512]],
        strides=[8, 16, 32], box_loss_type="CIoU")
    decoder = decode.RetinaFaceDecoder(
        anchor_sizes=[[8, 16, 32], [32, 64, 128], [128, 256, 512]],
        strides=[8, 16, 32])

    train_dataset = FaceDetectionDataset(
        face_detection_dataset_path,
        set_name_list=["wider_face"],
        set_type="train",
        transform=Compose([
            RandomHorizontalFlip(prob=0.5),
            RandomCrop(prob=0.5),
            DetectionResize(resize=input_image_size, stride=32,
                            resize_type="yolo_style", multi_scale=True,
                            multi_scale_range=[0.3, 1.0]),
            Normalize(),
        ]))
    test_dataset = FaceDetectionDataset(
        face_detection_dataset_path,
        set_name_list=["wider_face"],
        set_type="val",
        transform=Compose([
            DetectionResize(resize=input_image_size, stride=32,
                            resize_type="yolo_style"),
            Normalize(),
        ]))
    train_collater = DetectionCollater(resize=input_image_size,
                                       resize_type="yolo_style",
                                       max_annots_num=300)
    test_collater = DetectionCollater(resize=input_image_size,
                                      resize_type="yolo_style",
                                      max_annots_num=300)

    # official per-difficulty gt (resave_widerface_gt.py over the 4
    # eval-tools .mat files); when absent, the test entry falls back to
    # dataset boxes and the 3 APs collapse to one number
    widerface_gt_json_path = os.path.join(
        face_detection_dataset_path, "wider_face", "widerface_val_gt.json")

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
