"""Dataset root constants (parity with /root/reference/tools/path.py).

Override with the SIMPLEAICV_DATA_ROOT env var; defaults assume
/root/datasets/<name>.
"""

import os

_ROOT = os.environ.get("SIMPLEAICV_DATA_ROOT", "/root/datasets")

# converted / trained checkpoints referenced by experiment configs
# (reference: /root/autodl-tmp/pretrained_models, tools/path.py)
pretrained_models_path = os.environ.get(
    "SIMPLEAICV_PRETRAINED_ROOT", os.path.join(_ROOT, "pretrained_models"))

CIFAR10_path = os.path.join(_ROOT, "CIFAR10")
CIFAR100_path = os.path.join(_ROOT, "CIFAR100")
ILSVRC2012_path = os.path.join(_ROOT, "ILSVRC2012")
ImageNet21K_path = os.path.join(_ROOT, "ImageNet21K")
ACCV2022_path = os.path.join(_ROOT, "ACCV2022")
COCO2017_path = os.path.join(_ROOT, "COCO2017")
SAMACOCO_path = os.path.join(_ROOT, "SAMA-COCO")
Objects365_path = os.path.join(_ROOT, "Objects365")
VOCdataset_path = os.path.join(_ROOT, "VOCdataset")
ADE20Kdataset_path = os.path.join(_ROOT, "ADE20K")
CelebAMaskHQ_path = os.path.join(_ROOT, "CelebAMask-HQ")
FaceSynthetics_path = os.path.join(_ROOT, "FaceSynthetics")
CIHP_path = os.path.join(_ROOT, "CIHP")
LIP_path = os.path.join(_ROOT, "LIP")
salient_object_detection_dataset_path = os.path.join(
    _ROOT, "salient_object_detection")
human_matting_dataset_path = os.path.join(_ROOT, "human_matting")
text_detection_dataset_path = os.path.join(_ROOT, "text_detection")
text_recognition_dataset_path = os.path.join(_ROOT, "text_recognition")
face_detection_dataset_path = os.path.join(_ROOT, "face_detection")
interactive_segmentation_dataset_path = os.path.join(
    _ROOT, "interactive_segmentation")
video_interactive_segmentation_dataset_path = os.path.join(
    _ROOT, "video_interactive_segmentation")
face_parsing_dataset_path = os.path.join(_ROOT, "face_parsing")
human_parsing_dataset_path = os.path.join(_ROOT, "human_parsing")
