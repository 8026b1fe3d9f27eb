#!/usr/bin/env bash
python ../../../tools/train_distill_classification_model.py --work-dir "$(dirname "$0")"
