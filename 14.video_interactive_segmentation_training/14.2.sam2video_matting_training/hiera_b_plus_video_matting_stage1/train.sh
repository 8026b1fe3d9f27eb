#!/usr/bin/env bash
python ../../../tools/train_video_interactive_matting_model.py --work-dir "$(dirname "$0")"
