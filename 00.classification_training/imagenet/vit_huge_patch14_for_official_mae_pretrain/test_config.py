"""Eval config (parity with the reference's per-experiment
test_config.py): reuses this experiment's train_config model / test
dataset / collater; point `trained_model_path` at the checkpoint to
evaluate (torch .pth and orbax dirs both load).
"""

from train_config import config  # noqa: F401

# evaluate a specific checkpoint by setting:
# config.trained_model_path = "<path to orbax dir or .pth>"
