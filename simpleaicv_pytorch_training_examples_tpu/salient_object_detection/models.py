"""Salient-object detection model registry.

Parity with /root/reference/SimpleAICV/salient_object_detection/models/
pfan_segmentation.py factory list.
"""

from ..models.pfan import PFANSegmentation, make_pfan_factories

globals().update(make_pfan_factories(PFANSegmentation, "pfan_segmentation"))

__all__ = [k for k in globals() if k.endswith("_pfan_segmentation")]
