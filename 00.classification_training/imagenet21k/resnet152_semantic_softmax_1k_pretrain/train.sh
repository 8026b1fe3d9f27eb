#!/usr/bin/env bash
python ../../../tools/train_imagenet21k_classification_model.py --work-dir "$(dirname "$0")"
