"""CTC text recognition model, NHWC flax.

Parity with /root/reference/SimpleAICV/text_recognition/models/
{ctc_model,encoder,predictor}.py: backbone (height-mean-pooled C5) ->
BiLSTM encoder -> linear CTC head. Output [B, W, num_classes] logits
(batch-first; the reference emits [W,B,C] for torch CTCLoss — optax
ctc_loss is batch-first).

TPU note: the BiLSTM runs as two lax.scan passes (flax nn.RNN) over the
width axis; width is static so the scan compiles to a single fused loop.
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ...models import backbones as cls_backbones

__all__ = [
    "CTCModel",
    "resnet18_ctc_model", "resnet34_ctc_model", "resnet50_ctc_model",
    "resnet101_ctc_model", "resnet152_ctc_model",
    "convformers18_ctc_model", "convformerm36_ctc_model",
    "vanb0_ctc_model", "vanb2_ctc_model",
]


class BiLSTM(nn.Module):
    """One bidirectional LSTM layer: [fwd, bwd] concat on features (torch
    nn.LSTM(bidirectional=True) output order)."""
    hidden_planes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden_planes,
                                          name="fwd_cell"))
        bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden_planes,
                                          name="bwd_cell"),
                     reverse=True, keep_order=True)
        return jnp.concatenate([fwd(x), bwd(x)], axis=-1)


class BiLSTMEncoder(nn.Module):
    """Stacked encoder, structure-exact with the reference
    (/root/reference/SimpleAICV/text_recognition/models/encoder.py:17-47):
    linear0 -> BiLSTM -> linear1 -> BiLSTM -> linear2, so published CTC
    checkpoints convert leaf-for-leaf (utils/torch_convert.py)."""
    hidden_planes: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x [B, W, C]
        x = nn.Dense(self.hidden_planes, dtype=self.dtype,
                     name="linear0")(x)
        x = BiLSTM(self.hidden_planes, self.dtype, name="rnn1")(x)
        x = nn.Dense(self.hidden_planes, dtype=self.dtype,
                     name="linear1")(x)
        x = BiLSTM(self.hidden_planes, self.dtype, name="rnn2")(x)
        return nn.Dense(self.hidden_planes, dtype=self.dtype,
                        name="linear2")(x)


class CTCPredictor(nn.Module):
    """linear1 -> linear2 (reference predictor.py:17-28)."""
    num_classes: int
    hidden_planes: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_planes, dtype=self.dtype,
                     name="linear1")(x)
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        name="linear2")(x.astype(jnp.float32))


class CTCModel(nn.Module):
    backbone_type: str
    backbone_pretrained_path: str = ""
    planes: int = 256
    num_classes: int = 12114
    use_gradient_checkpoint: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kwargs = {}
        if self.backbone_type.startswith("resnet"):
            # OCR strides: W downsampled 8x (not 32x) so a 512-wide crop
            # keeps 64 CTC time steps for 80-char labels (reference OCR
            # resnet layer3/4 stride (2,1))
            kwargs["stage_strides"] = (1, 2, (2, 1), (2, 1))
        feats = cls_backbones.__dict__[self.backbone_type](
            dtype=self.dtype,
            use_gradient_checkpoint=self.use_gradient_checkpoint,
            name="backbone", **kwargs)(x, train=train,
                                       return_features=True)
        x = feats[-1]  # [B, H', W', C]
        x = jnp.mean(x, axis=1)  # height mean pool -> [B, W', C]
        x = BiLSTMEncoder(self.planes, self.dtype, name="encoder")(x)
        return CTCPredictor(self.num_classes, self.planes, self.dtype,
                            name="predictor")(x)


_BACKBONES = {
    "resnet18": "resnet18", "resnet34": "resnet34", "resnet50": "resnet50",
    "resnet101": "resnet101", "resnet152": "resnet152",
    "convformers18": "convformer_s18", "convformerm36": "convformer_m36",
    "vanb0": "van_b0", "vanb2": "van_b2",
}

for _short, _bb in _BACKBONES.items():
    def _factory(backbone_pretrained_path="", _bb=_bb, **kwargs):
        return CTCModel(_bb,
                        backbone_pretrained_path=backbone_pretrained_path,
                        **kwargs)
    globals()[f"{_short}_ctc_model"] = _factory
