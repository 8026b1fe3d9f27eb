"""ResNet101 / ImageNet-21K semantic-softmax training (1k-pretrain init).

Mirrors /root/reference/00.classification_training/imagenet21k/
resnet101_semantic_softmax_1k_pretrain/train_config.py. Target semantic
accuracy 75.354 (BASELINE.md).
"""

import os
import sys

BASE_DIR = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
sys.path.append(BASE_DIR)

from tools.path import ImageNet21K_path

from simpleaicv_pytorch_training_examples_tpu.classification import (
    backbones, losses)
from simpleaicv_pytorch_training_examples_tpu.classification.datasets.imagenet21kdataset import (
    ImageNet21KSemanticTreeLabelDataset)
from simpleaicv_pytorch_training_examples_tpu.classification.common import (
    Opencv2PIL, TorchResize, TorchCenterCrop, TorchRandomResizedCrop,
    TorchRandomHorizontalFlip, TorchMeanStdNormalize,
    ClassificationCollater, load_state_dict)
from simpleaicv_pytorch_training_examples_tpu.data import Compose


class config:
    network = "resnet101"
    num_classes = 10450
    input_image_size = 224
    scale = 256 / 224

    model = backbones.__dict__[network](**{
        "num_classes": num_classes,
    })

    # start from the ImageNet-1K pretrained checkpoint
    trained_model_path = ""
    load_state_dict(trained_model_path, model,
                    excluded_layer_name=("fc",))

    train_dataset = ImageNet21KSemanticTreeLabelDataset(
        root_dir=ImageNet21K_path, set_name="train",
        transform=Compose([
            Opencv2PIL(),
            TorchRandomResizedCrop(resize=input_image_size),
            TorchRandomHorizontalFlip(prob=0.5),
            TorchMeanStdNormalize(mean=[0.485, 0.456, 0.406],
                                  std=[0.229, 0.224, 0.225]),
        ]))
    test_dataset = ImageNet21KSemanticTreeLabelDataset(
        root_dir=ImageNet21K_path, set_name="val",
        transform=Compose([
            Opencv2PIL(),
            TorchResize(resize=int(input_image_size * scale)),
            TorchCenterCrop(resize=input_image_size),
            TorchMeanStdNormalize(mean=[0.485, 0.456, 0.406],
                                  std=[0.229, 0.224, 0.225]),
        ]))
    train_collater = ClassificationCollater()
    test_collater = ClassificationCollater()

    # semantic-softmax over the dataset's hierarchy tree (per-level
    # normalization factors come from the tree itself)
    train_criterion = losses.SemanticSoftmaxLoss(
        train_dataset.normalization_factor_list)
    test_criterion = losses.CELoss()

    seed = 0
    batch_size = 256
    num_workers = 16
    accumulation_steps = 1

    optimizer = (
        "AdamW",
        {
            "lr": 3e-4,
            "global_weight_decay": False,
            "weight_decay": 1e-4,
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

    epochs = 80
    print_interval = 100

    sync_bn = False
    use_amp = True
    use_compile = False
    use_ema_model = False
    ema_model_decay = 0.9999
