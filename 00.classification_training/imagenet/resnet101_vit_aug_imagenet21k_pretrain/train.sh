#!/bin/bash
# single host, all local TPU chips (SPMD; no torchrun needed)
cd "$(dirname "$0")"
python ../../../tools/train_classification_model.py --work-dir ./
