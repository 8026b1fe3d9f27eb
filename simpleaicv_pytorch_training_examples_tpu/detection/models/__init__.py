"""Detection model registry (string-name factory lookup, reference UX)."""

from .retinanet import *  # noqa: F401,F403
from .fcos import *  # noqa: F401,F403
from .detr import *  # noqa: F401,F403

# DINOv3 ConvNeXt detection backbones (reference
# detection/models/backbones/dinov3convnext.py:212-247 factories)
from ...models.backbones.dinov3_convnext import (  # noqa: F401
    dinov3convnexttinybackbone, dinov3convnextsmallbackbone,
    dinov3convnextbasebackbone, dinov3convnextlargebackbone)
