from .flash_attention import flash_attention
from .fused_attention import fused_attention
from .layer_norm import layer_norm
