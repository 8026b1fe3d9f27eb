#!/usr/bin/env bash
python ../../../tools/train_face_parsing_model.py --work-dir "$(dirname "$0")"
