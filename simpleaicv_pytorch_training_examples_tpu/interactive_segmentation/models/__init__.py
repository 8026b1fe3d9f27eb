from .segment_anything import SAM, sam_b, sam_l, sam_h
