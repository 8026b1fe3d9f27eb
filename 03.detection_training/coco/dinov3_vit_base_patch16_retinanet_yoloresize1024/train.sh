#!/usr/bin/env bash
python ../../../tools/train_detection_model.py --work-dir "$(dirname "$0")"
