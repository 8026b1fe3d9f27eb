#!/usr/bin/env bash
# Single-host eval (multi-host: set JAX_COORDINATOR_ADDRESS /
# JAX_NUM_PROCESSES / JAX_PROCESS_ID and run once per host —
# the torchrun-free analogue of the reference's test.sh).
python ../../../tools/test_classification_model.py --work-dir "$(dirname "$0")"
