#!/usr/bin/env bash
python ../../../../tools/train_universal_segmentation_model.py --work-dir "$(dirname "$0")"
