#!/usr/bin/env bash
python ../../../tools/train_universal_matting_model.py --work-dir "$(dirname "$0")"
