#!/usr/bin/env bash
python ../../../tools/train_human_parsing_model.py --work-dir "$(dirname "$0")"
