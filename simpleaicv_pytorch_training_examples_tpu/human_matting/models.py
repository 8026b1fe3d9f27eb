"""Human matting model registry.

Parity with /root/reference/SimpleAICV/human_matting/models/
pfan_matting.py factory list.
"""

from ..models.pfan import PFANMatting, make_pfan_factories

globals().update(make_pfan_factories(PFANMatting, "pfan_matting"))

__all__ = [k for k in globals() if k.endswith("_pfan_matting")]
