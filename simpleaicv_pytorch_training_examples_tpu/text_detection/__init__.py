from . import losses
from . import models
from . import decode
