from .segment_anything2.sam2 import (SAM2Video, sam2_hiera_tiny_video,
                                     sam2_hiera_small_video,
                                     sam2_hiera_base_plus_video,
                                     sam2_hiera_large_video)
from . import dinov3_segment_anything2
from .dinov3_segment_anything2 import *  # noqa: F401,F403
from .segment_anything2_matting import (
    SAM2ImageMatting, SAM2VideoMatting,
    sam2_hiera_tiny_image_matting, sam2_hiera_small_image_matting,
    sam2_hiera_base_plus_image_matting, sam2_hiera_large_image_matting,
    sam2_hiera_tiny_video_matting, sam2_hiera_small_video_matting,
    sam2_hiera_base_plus_video_matting, sam2_hiera_large_video_matting)
