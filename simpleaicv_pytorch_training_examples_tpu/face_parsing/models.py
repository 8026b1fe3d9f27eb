"""Face parsing model registry (PFAN semantic heads).

Parity with /root/reference/SimpleAICV/face_parsing/models/
pfan_face_parsing.py.
"""

from ..models.pfan import PFANSemanticSegmentation, make_pfan_factories

globals().update(make_pfan_factories(PFANSemanticSegmentation,
                                     "pfan_face_parsing"))

__all__ = [k for k in globals() if k.endswith("_pfan_face_parsing")]
