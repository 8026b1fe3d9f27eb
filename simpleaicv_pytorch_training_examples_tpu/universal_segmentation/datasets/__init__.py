from .universal_dataset import (UniversalBinaryCollater,
                                UniversalInstanceCollater,
                                UniversalSemanticCollater)
from .human_instance_matting_dataset import (
    HumanInstanceMattingDataset, UniversalInstanceMattingCollater)
