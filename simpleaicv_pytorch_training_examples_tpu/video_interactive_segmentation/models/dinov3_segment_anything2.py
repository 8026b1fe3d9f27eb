"""DINOv3-encoder SAM2 variants.

Parity with /root/reference/SimpleAICV/video_interactive_segmentation/
models/dinov3_segment_anything2/{dinov3_image_encoder,dinov3_sam2image,
dinov3_sam2video_train}.py and dinov3_segment_anything2_matting/: the
Hiera trunk + FpnNeck is replaced by a DINOv3 ViT whose /16 grid is
projected into the same ([/4, /8, /16] features, sine positions) contract
the SAM2 tracking loop consumes; everything downstream (prompt encoder,
SAM2 decoder, memory attention/encoder, matting head) is unchanged.
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ...models import backbones as cls_backbones
from .segment_anything2.image_encoder import sine_position_embedding_2d
from .segment_anything2.sam2 import SAM2Video
from .segment_anything2_matting import SAM2ImageMatting, SAM2VideoMatting

__all__ = ["DINOv3SAM2ImageEncoder"]


class DINOv3SAM2ImageEncoder(nn.Module):
    """DINOv3 /16 grid -> ([/4, /8, /16 features], sine positions) with
    uniform fpn_planes width, matching segment_anything2.ImageEncoder."""
    backbone_type: str = "dinov3_vit_base_patch16_backbone"
    fpn_planes: int = 256
    use_gradient_checkpoint: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        grid = cls_backbones.__dict__[self.backbone_type](
            dtype=self.dtype,
            use_gradient_checkpoint=self.use_gradient_checkpoint,
            name="backbone")(x, train=train)
        p2 = nn.gelu(nn.ConvTranspose(self.fpn_planes, (2, 2),
                                      strides=(2, 2), dtype=self.dtype,
                                      name="p2_up1")(grid))
        p2 = nn.ConvTranspose(self.fpn_planes, (2, 2), strides=(2, 2),
                              dtype=self.dtype, name="p2_up2")(p2)
        p3 = nn.ConvTranspose(self.fpn_planes, (2, 2), strides=(2, 2),
                              dtype=self.dtype, name="p3_up")(grid)
        p4 = nn.Conv(self.fpn_planes, (1, 1), dtype=self.dtype,
                     name="p4_conv")(grid)
        features = [p2, p3, p4]

        def pos(f):
            # sine_position_embedding_2d emits 2*planes channels
            pe = sine_position_embedding_2d(f.shape[1], f.shape[2],
                                            self.fpn_planes // 2)
            return jnp.broadcast_to(pe[None], f.shape).astype(f.dtype)

        return features, [pos(f) for f in features]


_DINOV3_SAM2_SIZES = (
    "dinov3_vit_small_patch16", "dinov3_vit_small_plus_patch16",
    "dinov3_vit_base_patch16", "dinov3_vit_large_patch16",
    "dinov3_vit_large_plus_patch16", "dinov3_vit_huge_plus_patch16",
)

for _n in _DINOV3_SAM2_SIZES:
    def _video_factory(_n=_n, **kwargs):
        return SAM2Video(image_encoder_type=f"{_n}_backbone", **kwargs)

    def _image_matting_factory(_n=_n, **kwargs):
        return SAM2ImageMatting(image_encoder_type=f"{_n}_backbone",
                                **kwargs)

    def _video_matting_factory(_n=_n, **kwargs):
        return SAM2VideoMatting(image_encoder_type=f"{_n}_backbone",
                                **kwargs)

    globals()[f"{_n}_sam2_video"] = _video_factory
    globals()[f"{_n}_sam2_image_matting"] = _image_matting_factory
    globals()[f"{_n}_sam2_video_matting"] = _video_matting_factory
    __all__ += [f"{_n}_sam2_video", f"{_n}_sam2_image_matting",
                f"{_n}_sam2_video_matting"]
