"""SAM matting losses.

Parity with /root/reference/SimpleAICV/interactive_segmentation/
losses_matting.py (1,415 LoC): the trimap/alpha loss family is shared with
human matting — GlobalTrimapCELoss / GloabelTrimapIouLoss /
LocalAlphaLoss / LocalLaplacianLoss / FusionAlphaLoss /
FusionLaplacianLoss / CompositionLoss (re-exported), driven by the matting
train entry's loss-dict dispatch.
"""

from ..human_matting.losses import (CompositionLoss, FusionAlphaLoss,
                                    FusionLaplacianLoss, GlobalTrimapCELoss,
                                    GloabelTrimapIouLoss, LocalAlphaLoss,
                                    LocalLaplacianLoss)

__all__ = [
    "GlobalTrimapCELoss", "GloabelTrimapIouLoss", "LocalAlphaLoss",
    "LocalLaplacianLoss", "FusionAlphaLoss", "FusionLaplacianLoss",
    "CompositionLoss",
]
