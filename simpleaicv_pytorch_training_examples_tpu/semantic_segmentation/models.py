"""Semantic segmentation model registry (PFAN over all backbones).

Parity with /root/reference/SimpleAICV/semantic_segmentation/models/
pfan_semantic_segmentation.py:331-415 factory list.
"""

from ..models.pfan import PFANSemanticSegmentation, make_pfan_factories

globals().update(make_pfan_factories(PFANSemanticSegmentation,
                                     "pfan_semantic_segmentation"))

__all__ = [k for k in globals() if k.endswith("_pfan_semantic_segmentation")]
