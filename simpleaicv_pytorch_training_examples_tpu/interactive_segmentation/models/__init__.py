from .segment_anything import SAM, sam_b, sam_l, sam_h
from .segment_anything_matting import (SAMMatting, sam_b_matting,
                                       sam_l_matting, sam_h_matting)
from . import dinov3_segment_anything
from .dinov3_segment_anything import *  # noqa: F401,F403 (dinov3 factories)
