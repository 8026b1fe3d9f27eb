"""Instance segmentation model registry."""

from .solov2 import *  # noqa: F401,F403
from .yolact import *  # noqa: F401,F403
