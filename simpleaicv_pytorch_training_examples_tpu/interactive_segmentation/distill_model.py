"""SAM encoder distillation models.

Parity with /root/reference/SimpleAICV/interactive_segmentation/
distill_model.py:21-140: frozen SAM ViT teacher encoder -> SAM ViT student
(ImageEncoderDistillModel) or DINOv3 student with a 1x1 projection neck to
the 256-dim SAM embedding space (DINOV3ImageEncoderDistillModel). Teacher
freezing = stop_gradient + the train entry zeroing the teacher's lr group.
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models import backbones as cls_backbones
from .models.segment_anything.image_encoder import (LayerNorm2d,
                                                    ViTImageEncoder)

__all__ = ["ImageEncoderDistillModel", "DINOV3ImageEncoderDistillModel"]


class ImageEncoderDistillModel(nn.Module):
    teacher_params: Any = None
    student_params: Any = None
    teacher_pretrained_path: str = ""
    student_pretrained_path: str = ""
    freeze_teacher: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        tp = dict(self.teacher_params or {})
        sp = dict(self.student_params or {})
        tp.pop("inplanes", None)
        sp.pop("inplanes", None)
        self.teacher = ViTImageEncoder(dtype=self.dtype, name="teacher",
                                       **tp)
        self.student = ViTImageEncoder(dtype=self.dtype, name="student",
                                       **sp)

    def __call__(self, x, train: bool = False):
        tea_out = self.teacher(x)
        if self.freeze_teacher:
            tea_out = jax.lax.stop_gradient(tea_out)
        stu_out = self.student(x)
        return tea_out, stu_out


class DINOV3ImageEncoderDistillModel(nn.Module):
    teacher_params: Any = None
    student_backbone_type: str = "dinov3_vit_base_patch16_backbone"
    out_planes: int = 256
    teacher_pretrained_path: str = ""
    student_pretrained_path: str = ""
    freeze_teacher: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        tp = dict(self.teacher_params or {})
        tp.pop("inplanes", None)
        self.teacher = ViTImageEncoder(dtype=self.dtype, name="teacher",
                                       **tp)
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
        tea_out = self.teacher(x)
        if self.freeze_teacher:
            tea_out = jax.lax.stop_gradient(tea_out)
        stu = self.student(x, train=train)
        stu = self.student_neck_ln1(self.student_neck_conv1(stu))
        stu = self.student_neck_ln2(self.student_neck_conv2(stu))
        return tea_out, stu
