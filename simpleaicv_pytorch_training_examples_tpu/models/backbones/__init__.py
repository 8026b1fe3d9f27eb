"""Classification backbones — the string-name registry.

Models are selected by ``backbones.__dict__[name](**kwargs)`` exactly like
the reference (/root/reference/00.classification_training/imagenet/resnet50/
train_config.py:33); every factory returns a flax Module.
"""

from .resnet import (resnet18, resnet34, resnet50, resnet101, resnet152)
from .resnetcifar import (resnet18cifar, resnet34cifar, resnet50cifar,
                          resnet101cifar, resnet152cifar)
from .darknet import darknettiny, darknet19, darknet53
from .van import (van_b0, van_b1, van_b2, van_b3, van_b4, van_b5, van_b6)
from .convformer import (convformer_s18, convformer_s36, convformer_m36,
                         convformer_b36)
from .vit import vit_base_patch16, vit_large_patch16, vit_huge_patch14
from .dinov3_vit import (dinov3_vit_small_patch16_backbone,
                         dinov3_vit_small_plus_patch16_backbone,
                         dinov3_vit_base_patch16_backbone,
                         dinov3_vit_large_patch16_backbone,
                         dinov3_vit_large_plus_patch16_backbone,
                         dinov3_vit_huge_plus_patch16_backbone,
                         dinov3_vit_small_patch16_det_backbone,
                         dinov3_vit_small_plus_patch16_det_backbone,
                         dinov3_vit_base_patch16_det_backbone,
                         dinov3_vit_large_patch16_det_backbone,
                         dinov3_vit_large_plus_patch16_det_backbone,
                         dinov3_vit_huge_plus_patch16_det_backbone,
                         DINOv3MultiScaleBackbone, VitPyramidNeck)
from .dinov3_convnext import (dinov3convnexttinybackbone,
                              dinov3convnextsmallbackbone,
                              dinov3convnextbasebackbone,
                              dinov3convnextlargebackbone,
                              Dinov3ConvNeXtBackbone)
