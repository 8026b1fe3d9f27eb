from . import losses
from . import losses_matting
from . import models
