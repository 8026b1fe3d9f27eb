"""ResNet152 -> ResNet50 KD distillation (frozen teacher) / ImageNet1K.

Mirrors /root/reference/01.distillation_training/imagenet/
resnet_152_kd_50/train_config.py (CE + KD on T-softened logits,
frozen teacher, bs256, 100ep).
"""

import os
import sys

BASE_DIR = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
sys.path.append(BASE_DIR)

from tools.path import ILSVRC2012_path

from simpleaicv_pytorch_training_examples_tpu.distillation import losses
from simpleaicv_pytorch_training_examples_tpu.distillation.distillmodel import (
    KDModel)
from simpleaicv_pytorch_training_examples_tpu.classification.datasets.ilsvrc2012dataset import ILSVRC2012Dataset
from simpleaicv_pytorch_training_examples_tpu.classification.common import (
    Opencv2PIL, TorchResize, TorchCenterCrop, TorchRandomResizedCrop,
    TorchRandomHorizontalFlip, TorchMeanStdNormalize,
    ClassificationCollater, load_state_dict)
from simpleaicv_pytorch_training_examples_tpu.data import Compose


class config:
    input_image_size = 224
    scale = 256 / 224

    teacher = "resnet152"
    student = "resnet50"
    teacher_pretrained_model_path = ""
    student_pretrained_model_path = ""
    freeze_teacher = True
    num_classes = 1000

    model = KDModel(teacher_type=teacher, student_type=student,
                    teacher_pretrained_path=teacher_pretrained_model_path,
                    student_pretrained_path=student_pretrained_model_path,
                    freeze_teacher=freeze_teacher,
                    num_classes=num_classes)

    trained_model_path = ""
    load_state_dict(trained_model_path, model)

    loss_list = ["CELoss", "KDLoss"]
    loss_ratio = {"CELoss": 1.0, "KDLoss": 1.0}
    T = 1.0
    train_criterion = {}
    for loss_name in loss_list:
        if loss_name in ("KDLoss", "DMLLoss"):
            train_criterion[loss_name] = losses.__dict__[loss_name](T)
        else:
            train_criterion[loss_name] = losses.__dict__[loss_name]()
    test_criterion = losses.CELoss()

    train_dataset = ILSVRC2012Dataset(
        root_dir=ILSVRC2012_path, set_name="train",
        transform=Compose([
            Opencv2PIL(),
            TorchRandomResizedCrop(resize=input_image_size),
            TorchRandomHorizontalFlip(prob=0.5),
            TorchMeanStdNormalize(mean=[0.485, 0.456, 0.406],
                                  std=[0.229, 0.224, 0.225]),
        ]))
    test_dataset = ILSVRC2012Dataset(
        root_dir=ILSVRC2012_path, set_name="val",
        transform=Compose([
            Opencv2PIL(),
            TorchResize(resize=int(input_image_size * scale)),
            TorchCenterCrop(resize=input_image_size),
            TorchMeanStdNormalize(mean=[0.485, 0.456, 0.406],
                                  std=[0.229, 0.224, 0.225]),
        ]))
    train_collater = ClassificationCollater()
    test_collater = ClassificationCollater()

    seed = 0
    batch_size = 256
    num_workers = 16
    accumulation_steps = 1

    optimizer = (
        "SGD",
        {
            "lr": 0.1,
            "momentum": 0.9,
            "global_weight_decay": False,
            "weight_decay": 1e-4,
            "no_weight_decay_layer_name_list": [],
        },
    )

    scheduler = (
        "MultiStepLR",
        {
            "warm_up_epochs": 0,
            "gamma": 0.1,
            "milestones": [30, 60, 90],
        },
    )

    epochs = 100
    print_interval = 100

    sync_bn = False
    use_amp = True
    use_compile = False
    use_ema_model = False
    ema_model_decay = 0.9999
