"""Classification backbone registry (re-export for the config UX).

Configs do ``backbones.__dict__[network](**kwargs)`` exactly like the
reference (/root/reference/00.classification_training/.../train_config.py).
"""

from ..models.backbones import *  # noqa: F401,F403
