"""Every experiment work-dir config must import without data on disk.

The reference ships 116 experiment dirs whose `class config` bodies execute
at import (SURVEY.md L4); this sweep is the contract that ours stay
importable on a machine with no datasets (datasets defer IO errors to
first use)."""

import glob
import importlib
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = sorted(
    glob.glob(os.path.join(REPO, "[0-9]*", "**", "train_config.py"),
              recursive=True))


def test_config_matrix_size():
    # reference parity: 116 experiment dirs (VERDICT round-1 item 3)
    assert len(CONFIGS) >= 110, len(CONFIGS)


@pytest.mark.parametrize(
    "path", CONFIGS,
    ids=[os.path.relpath(os.path.dirname(p), REPO) for p in CONFIGS])
def test_config_imports_without_data(path):
    d = os.path.dirname(path)
    sys.path.insert(0, d)
    try:
        sys.modules.pop("train_config", None)
        cfgmod = importlib.import_module("train_config")
        cfg = cfgmod.config
        # contract: the canonical attributes exist
        assert hasattr(cfg, "seed")
        assert hasattr(cfg, "batch_size")
        assert hasattr(cfg, "epochs")
        assert hasattr(cfg, "optimizer")
        assert hasattr(cfg, "scheduler")
        assert hasattr(cfg, "model") or hasattr(cfg, "teacher_model")
    finally:
        sys.path.pop(0)
        sys.modules.pop("train_config", None)
