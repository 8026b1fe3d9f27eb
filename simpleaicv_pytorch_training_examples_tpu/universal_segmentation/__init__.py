from . import models
from . import segmentation_losses
from . import segmentation_decode
