from .sam import SAM, sam_b, sam_l, sam_h
