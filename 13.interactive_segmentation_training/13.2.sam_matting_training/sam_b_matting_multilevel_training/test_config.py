"""Eval config: reuses train_config."""

from train_config import config  # noqa: F401
