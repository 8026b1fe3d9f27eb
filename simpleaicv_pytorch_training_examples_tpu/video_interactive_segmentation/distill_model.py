"""SAM2 (Hiera) encoder distillation models.

Parity with /root/reference/SimpleAICV/video_interactive_segmentation/
distill_model.py:21-115: frozen Hiera teacher encoder -> Hiera student
(ImageEncoderDistillModel) or DINOv3 student with an FPN-dim projection
neck (DINOV3ImageEncoderDistillModel). Both compare the /16 FPN feature
map. Teacher freezing = stop_gradient + zero-lr group in the train entry.
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..interactive_segmentation.models.segment_anything.image_encoder import (
    LayerNorm2d)
from ..models import backbones as cls_backbones
from .models.segment_anything2.image_encoder import ImageEncoder

__all__ = ["ImageEncoderDistillModel", "DINOV3ImageEncoderDistillModel"]


class ImageEncoderDistillModel(nn.Module):
    teacher_params: Any = None
    student_params: Any = None
    teacher_pretrained_path: str = ""
    student_pretrained_path: str = ""
    freeze_teacher: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.teacher = ImageEncoder(dtype=self.dtype, name="teacher",
                                    **dict(self.teacher_params or {}))
        self.student = ImageEncoder(dtype=self.dtype, name="student",
                                    **dict(self.student_params or {}))

    def __call__(self, x, train: bool = False):
        tea_feats, _ = self.teacher(x)
        tea_out = tea_feats[-1]
        if self.freeze_teacher:
            tea_out = jax.lax.stop_gradient(tea_out)
        stu_feats, _ = self.student(x)
        return tea_out, stu_feats[-1]


class DINOV3ImageEncoderDistillModel(nn.Module):
    teacher_params: Any = None
    student_backbone_type: str = "dinov3_vit_base_patch16_backbone"
    out_planes: int = 256
    teacher_pretrained_path: str = ""
    student_pretrained_path: str = ""
    freeze_teacher: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.teacher = ImageEncoder(dtype=self.dtype, name="teacher",
                                    **dict(self.teacher_params or {}))
        self.student = cls_backbones.__dict__[self.student_backbone_type](
            dtype=self.dtype, name="student")
        self.student_neck_conv1 = nn.Conv(self.out_planes, (1, 1),
                                          use_bias=False, dtype=self.dtype,
                                          name="student_neck_conv1")
        self.student_neck_ln1 = LayerNorm2d(name="student_neck_ln1")
        self.student_neck_conv2 = nn.Conv(self.out_planes, (3, 3),
                                          padding=1, use_bias=False,
                                          dtype=self.dtype,
                                          name="student_neck_conv2")
        self.student_neck_ln2 = LayerNorm2d(name="student_neck_ln2")

    def __call__(self, x, train: bool = False):
        tea_feats, _ = self.teacher(x)
        tea_out = tea_feats[-1]
        if self.freeze_teacher:
            tea_out = jax.lax.stop_gradient(tea_out)
        stu = self.student(x, train=train)
        stu = self.student_neck_ln1(self.student_neck_conv1(stu))
        stu = self.student_neck_ln2(self.student_neck_conv2(stu))
        # match the teacher's /16 grid if the student runs at a different
        # patch stride
        if stu.shape[1] != tea_out.shape[1]:
            stu = jax.image.resize(
                stu, (stu.shape[0], tea_out.shape[1], tea_out.shape[2],
                      stu.shape[-1]), "bilinear")
        return tea_out, stu
