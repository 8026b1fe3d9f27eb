from .universal_dataset import (UniversalBinaryCollater,
                                UniversalInstanceCollater,
                                UniversalSemanticCollater)
