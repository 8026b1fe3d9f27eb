#!/usr/bin/env bash
# Single-host launch (multi-host: set JAX_COORDINATOR_ADDRESS /
# JAX_NUM_PROCESSES / JAX_PROCESS_ID and run once per host —
# the torchrun-free analogue of the reference's train.sh).
python ../../../tools/train_interactive_segmentation_model.py --work-dir "$(dirname "$0")"
