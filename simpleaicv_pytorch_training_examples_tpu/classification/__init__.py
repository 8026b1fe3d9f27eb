from . import backbones
from . import losses
