"""DINOv3-ViT-L universal segmentation / COCO2017 (512^2, 100ep).

Mirrors /root/reference/16.universal_segmentation_training COCO recipe.
Target mIoU 47.82 (BASELINE.md).
"""

import os
import sys

import numpy as np

BASE_DIR = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))))
sys.path.append(BASE_DIR)

from tools.path import COCO2017_path

from simpleaicv_pytorch_training_examples_tpu.universal_segmentation import (
    models, segmentation_losses, segmentation_decode)
from simpleaicv_pytorch_training_examples_tpu.semantic_segmentation.datasets.cocosemanticsegmentationdataset import CocoSemanticSegmentation
from simpleaicv_pytorch_training_examples_tpu.semantic_segmentation.common import (
    YoloStyleResize, RandomHorizontalFlip, Normalize, load_state_dict)
from simpleaicv_pytorch_training_examples_tpu.data import Compose


class UniversalSegCollater:
    """Semantic masks -> per-class instance mask stacks [B,M,H,W] +
    class labels [B,M] for the Hungarian set loss."""

    def __init__(self, resize=512, max_instances=32):
        self.resize = resize
        self.max_instances = max_instances

    def __call__(self, samples):
        n = len(samples)
        r = self.resize
        images = np.zeros((n, r, r, 3), np.float32)
        gt_classes = np.full((n, self.max_instances), -1.0, np.float32)
        gt_masks = np.zeros((n, self.max_instances, r, r), np.float32)
        for i, s in enumerate(samples):
            img, m = s["image"], s["mask"]
            h, w = img.shape[:2]
            images[i, :h, :w] = img
            classes = np.unique(m.astype(np.int64))
            classes = classes[classes > 0][:self.max_instances]
            for j, c in enumerate(classes):
                gt_classes[i, j] = c
                gt_masks[i, j, :h, :w] = (m == c).astype(np.float32)
        return {"image": images, "gt_classes": gt_classes,
                "gt_masks": gt_masks}


class config:
    network = "dinov3_vit_large_patch16_universal_segmentation"
    num_classes = 81
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

    train_criterion = segmentation_losses.UniversalSegmentationLoss(
        num_classes=num_classes)
    decoder = segmentation_decode.UniversalSegmentationDecoder(
        num_classes=num_classes, mode="semantic")

    train_dataset = CocoSemanticSegmentation(
        COCO2017_path, set_name="train2017",
        transform=Compose([
            YoloStyleResize(resize=input_image_size, multi_scale=True,
                            multi_scale_range=[0.8, 1.0]),
            RandomHorizontalFlip(prob=0.5),
            Normalize(),
        ]))
    test_dataset = None
    train_collater = UniversalSegCollater(resize=input_image_size)

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

    use_amp = True
    use_ema_model = False
