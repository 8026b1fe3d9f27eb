"""ResNet50-CTC OCR text recognition (32x512, bs1024 effective, 50ep).

Mirrors /root/reference/09.ocr_text_recognition_training/
resnet50_ctc_model/train_config.py. Target LCS precision 99.14
(BASELINE.md). Char table: the shipped 12,111-char merged table
(char_sets/final_char_table.txt) by default; a dataset-local table
overrides it.
"""

import os
import sys

BASE_DIR = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.append(BASE_DIR)

from tools.path import text_recognition_dataset_path

from simpleaicv_pytorch_training_examples_tpu.text_recognition import (
    models, losses)
from simpleaicv_pytorch_training_examples_tpu.text_recognition.datasets.text_recognition_dataset import TextRecognition
from simpleaicv_pytorch_training_examples_tpu.text_recognition.common import (
    CTCTextLabelConverter, Distort, KeepRatioResizeTextRecognitionCollater,
    Normalize, Perspective, RandomBrightness, RandomBlur, RandomRotate,
    RandomScale, Stretch, load_state_dict)
from simpleaicv_pytorch_training_examples_tpu.data import Compose
from simpleaicv_pytorch_training_examples_tpu.text_recognition.char_sets import (
    FINAL_CHAR_TABLE)

# dataset-specific table wins if present; the shipped 12,111-char merged
# table (reference final_char_table.py) is the default
_chars_file = os.path.join(text_recognition_dataset_path,
                           "final_char_table.txt")
if not os.path.exists(_chars_file):
    _chars_file = FINAL_CHAR_TABLE


class config:
    network = "resnet50_ctc_model"
    input_image_size = (32, 512)

    converter = CTCTextLabelConverter(chars_file=_chars_file,
                                      str_max_length=80)
    num_classes = converter.num_classes

    backbone_pretrained_path = ""
    model = models.__dict__[network](**{
        "backbone_pretrained_path": backbone_pretrained_path,
        "num_classes": num_classes,
    })

    trained_model_path = ""
    load_state_dict(trained_model_path, model)

    train_criterion = losses.CTCLoss(blank_index=converter.blank_index,
                                     use_focal_weight=False)

    train_dataset = TextRecognition(
        text_recognition_dataset_path,
        # the reference's full per-language source list (aihub/chinese +
        # synthetic subsets + meta-self-learning domains)
        set_name_list=["aistudio_baidu_street",
                       "chinese_dataset",
                       "synthetic_chinese_string_dataset_trainsubset0",
                       "synthetic_chinese_string_dataset_trainsubset1",
                       "synthetic_chinese_string_dataset_trainsubset2",
                       "synthetic_chinese_string_dataset_trainsubset3",
                       "meta_self_learning_car",
                       "meta_self_learning_document_trainsubset0",
                       "meta_self_learning_document_trainsubset1",
                       "meta_self_learning_hand",
                       "meta_self_learning_street",
                       "meta_self_learning_syn"],
        set_type="train",
        transform=Compose([
            # full reference aug family (train_config.py:91-98), incl. the
            # WarpMLS Distort/Stretch and Perspective warps
            RandomScale(prob=0.5),
            RandomBlur(prob=0.5),
            RandomBrightness(prob=0.3),
            RandomRotate(prob=0.5),
            Distort(prob=0.2),
            Stretch(prob=0.2),
            Perspective(prob=0.2),
            Normalize(),
        ]))
    # per-source val lists (reference val_dataset_name_list: the combined
    # set first, then each language/domain evaluated separately via
    # tools/test_text_recognition_model.py)
    val_dataset_name_list = [
        ["aistudio_baidu_street", "chinese_dataset",
         "synthetic_chinese_string_dataset_testsubset",
         "meta_self_learning_car",
         "meta_self_learning_document_testsubset",
         "meta_self_learning_hand", "meta_self_learning_street",
         "meta_self_learning_syn"],
        ["aistudio_baidu_street"],
        ["chinese_dataset"],
        ["synthetic_chinese_string_dataset_testsubset"],
    ]
    test_dataset = TextRecognition(
        text_recognition_dataset_path,
        set_name_list=val_dataset_name_list[0],
        set_type="val",
        transform=Compose([Normalize()]))
    # per-source eval datasets consumed by tools/test_text_recognition_model
    val_dataset_list = [
        TextRecognition(text_recognition_dataset_path,
                        set_name_list=names, set_type="val",
                        transform=Compose([Normalize()]))
        for names in val_dataset_name_list
    ]
    train_collater = KeepRatioResizeTextRecognitionCollater(
        converter, resize_h=32, max_w=512)
    test_collater = KeepRatioResizeTextRecognitionCollater(
        converter, resize_h=32, max_w=512)

    seed = 0
    batch_size = 512
    num_workers = 32
    accumulation_steps = 2

    optimizer = (
        "AdamW",
        {
            "lr": 1e-4,
            "global_weight_decay": False,
            "weight_decay": 1e-3,
            "no_weight_decay_layer_name_list": [],
        },
    )

    scheduler = (
        "CosineLR",
        {
            "warm_up_epochs": 1,
            "min_lr": 1e-6,
        },
    )

    epochs = 50
    print_interval = 100

    use_amp = True
    use_ema_model = False
