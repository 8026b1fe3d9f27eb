"""Knowledge-distillation teacher/student model.

Parity with /root/reference/SimpleAICV/distillation/distillmodel.py:19-60
(KDModel): any two classification backbones by string name; frozen teacher
runs under stop_gradient (the functional equivalent of requires_grad=False +
torch.no_grad). When `freeze_teacher`, the train entry also zeroes the
teacher's lr via a ``sub_layer_lr {'teacher': 0}`` param-group override so
weight decay cannot drift the frozen weights.
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models import backbones

__all__ = ["KDModel"]


class KDModel(nn.Module):
    teacher_type: str = "resnet34"
    student_type: str = "resnet18"
    teacher_pretrained_path: str = ""
    student_pretrained_path: str = ""
    freeze_teacher: bool = True
    num_classes: int = 1000
    use_gradient_checkpoint: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.teacher = backbones.__dict__[self.teacher_type](
            num_classes=self.num_classes, dtype=self.dtype,
            name="teacher")
        self.student = backbones.__dict__[self.student_type](
            num_classes=self.num_classes, dtype=self.dtype,
            name="student")

    def __call__(self, x, train: bool = False):
        # frozen teacher always runs in eval mode (reference:
        # tools/scripts.py:302 model.module.teacher.eval())
        tea_out = self.teacher(x, train=(train and not self.freeze_teacher))
        if self.freeze_teacher:
            tea_out = jax.lax.stop_gradient(tea_out)
        stu_out = self.student(x, train=train)
        return tea_out, stu_out
