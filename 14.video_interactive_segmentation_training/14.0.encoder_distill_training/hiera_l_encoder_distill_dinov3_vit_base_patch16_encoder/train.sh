#!/usr/bin/env bash
python ../../../tools/train_video_interactive_segmentation_distill_encoder_model.py --work-dir "$(dirname "$0")"
