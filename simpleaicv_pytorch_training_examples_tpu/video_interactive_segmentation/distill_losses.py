"""SAM2 encoder distillation loss.

Parity with /root/reference/SimpleAICV/video_interactive_segmentation/
distill_losses.py:10-25: mean MSE between teacher and student /16 FPN
feature maps.
"""

from ..interactive_segmentation.distill_losses import MSELoss

__all__ = ["MSELoss"]
