"""ViT-L/16 MAE self-supervised pretraining on ImageNet1K.

Mirrors /root/reference/02.masked_image_modeling_training/imagenet/
mae_vit_large_patch16_224/train_config.py (AdamW 6e-4 b2=0.95, cosine with
40 warmup epochs, 400ep, bs1024). Target: recon loss 0.3876 (BASELINE.md).
"""

import os
import sys

BASE_DIR = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
sys.path.append(BASE_DIR)

from tools.path import ILSVRC2012_path

from simpleaicv_pytorch_training_examples_tpu.masked_image_modeling import (
    models, losses)
from simpleaicv_pytorch_training_examples_tpu.masked_image_modeling.common import (
    MAESelfSupervisedPretrainCollater)
from simpleaicv_pytorch_training_examples_tpu.classification.datasets.ilsvrc2012dataset import ILSVRC2012Dataset
from simpleaicv_pytorch_training_examples_tpu.classification.common import (
    Opencv2PIL, TorchRandomResizedCrop, TorchRandomHorizontalFlip, Normalize,
    load_state_dict)
from simpleaicv_pytorch_training_examples_tpu.data import Compose


class config:
    network = "vit_large_patch16_224_mae_pretrain_model"
    input_image_size = 224

    model = models.__dict__[network](**{
        # pallas fused short-N attention where head_dim is 64/128
        # (vit_b/l encoders); other widths fall back to XLA automatically
        "use_fused_attention": True,
    })

    trained_model_path = ""
    load_state_dict(trained_model_path, model)

    train_criterion = losses.MSELoss()

    train_dataset = ILSVRC2012Dataset(
        root_dir=ILSVRC2012_path,
        set_name="train",
        transform=Compose([
            Opencv2PIL(),
            TorchRandomResizedCrop(resize=input_image_size,
                                   scale=(0.2, 1.0)),
            TorchRandomHorizontalFlip(prob=0.5),
            Normalize(),
        ]))
    test_dataset = None
    train_collater = MAESelfSupervisedPretrainCollater(
        image_size=input_image_size, patch_size=16, norm_label=True)

    seed = 0
    batch_size = 1024
    num_workers = 32
    accumulation_steps = 1

    optimizer = (
        "AdamW",
        {
            # lr = base_lr:1.5e-4 * batch_size * accumulation_steps / 256
            "lr": 6e-4,
            "global_weight_decay": False,
            "weight_decay": 5e-2,
            "no_weight_decay_layer_name_list": [],
            "beta1": 0.9,
            "beta2": 0.95,
        },
    )

    scheduler = (
        "CosineLR",
        {
            "warm_up_epochs": 40,
            "min_lr": 1e-6,
        },
    )

    epochs = 400
    print_interval = 100

    use_amp = True
    use_ema_model = False
