"""Eval config: reuses train_config (see stage1)."""

from train_config import config  # noqa: F401
