"""Detection model registry (string-name factory lookup, reference UX)."""

from .retinanet import *  # noqa: F401,F403
from .fcos import *  # noqa: F401,F403
from .detr import *  # noqa: F401,F403
