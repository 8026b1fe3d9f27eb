"""Human parsing model registry (PFAN semantic heads).

Parity with /root/reference/SimpleAICV/human_parsing/models/
pfan_human_parsing.py.
"""

from ..models.pfan import PFANSemanticSegmentation, make_pfan_factories

globals().update(make_pfan_factories(PFANSemanticSegmentation,
                                     "pfan_human_parsing"))

__all__ = [k for k in globals() if k.endswith("_pfan_human_parsing")]
