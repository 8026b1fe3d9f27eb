"""Human parsing dataset (CIHP / LIP preprocessed layout).

Parity with /root/reference/SimpleAICV/human_parsing/datasets/
human_parsing_dataset.py — same paired jpg/png folder scheme as face
parsing.
"""

from ...face_parsing.datasets.face_parsing_dataset import FaceParsingDataset


class HumanParsingDataset(FaceParsingDataset):
    pass
