"""DINOv3-encoder SAM variants.

Parity with /root/reference/SimpleAICV/interactive_segmentation/models/
dinov3_segment_anything/{dinov3_image_encoder,dinov3_sam}.py and
dinov3_segment_anything_matting/dinov3_sam_matting.py: the SAM ViT
image encoder is replaced by a DINOv3 ViT (axial RoPE, LayerScale) with a
conv1x1+LN / conv3x3+LN projection neck to the 256-dim prompt-decoder
embedding space; prompt encoder / mask decoder / matting head unchanged.
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ...models import backbones as cls_backbones
from .segment_anything.image_encoder import LayerNorm2d
from .segment_anything.sam import SAM
from ..models.segment_anything_matting import SAMMatting

__all__ = ["DINOv3SAMImageEncoder"]


class DINOv3SAMImageEncoder(nn.Module):
    """DINOv3 grid features -> SAM 256-dim embedding map (reference
    dinov3_image_encoder.py neck)."""
    backbone_type: str = "dinov3_vit_base_patch16_backbone"
    out_planes: int = 256
    use_gradient_checkpoint: bool = False
    # accepted for SAM-API parity; DINOv3 RoPE attention keeps the XLA path
    use_flash_attention: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        grid = cls_backbones.__dict__[self.backbone_type](
            dtype=self.dtype,
            use_gradient_checkpoint=self.use_gradient_checkpoint,
            name="backbone")(x, train=train)
        y = nn.Conv(self.out_planes, (1, 1), use_bias=False,
                    dtype=self.dtype, name="neck_conv1")(grid)
        y = LayerNorm2d(name="neck_ln1")(y)
        y = nn.Conv(self.out_planes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="neck_conv2")(y)
        return LayerNorm2d(name="neck_ln2")(y)


_DINOV3_SAM_SIZES = (
    "dinov3_vit_small_patch16", "dinov3_vit_small_plus_patch16",
    "dinov3_vit_base_patch16", "dinov3_vit_large_patch16",
    "dinov3_vit_large_plus_patch16", "dinov3_vit_huge_plus_patch16",
)

for _n in _DINOV3_SAM_SIZES:
    def _sam_factory(image_size=1024, _n=_n, **kwargs):
        return SAM(image_size=image_size,
                   image_encoder_type=f"{_n}_backbone", **kwargs)

    def _sam_matting_factory(image_size=1024, _n=_n, **kwargs):
        return SAMMatting(image_size=image_size,
                          image_encoder_type=f"{_n}_backbone", **kwargs)

    globals()[f"{_n}_sam"] = _sam_factory
    globals()[f"{_n}_sam_matting"] = _sam_matting_factory
    __all__ += [f"{_n}_sam", f"{_n}_sam_matting"]
