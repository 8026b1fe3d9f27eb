from . import models
from ..semantic_segmentation import losses  # noqa: F401 (same loss family)
