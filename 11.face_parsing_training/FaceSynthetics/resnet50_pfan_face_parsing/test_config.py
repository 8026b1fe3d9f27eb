"""Eval config (parity with the reference's per-experiment
test_config.py): reuses this experiment's train_config model / test
dataset / collater.
"""

from train_config import config  # noqa: F401
