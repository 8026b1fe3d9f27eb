"""End-to-end drive of the classification TEST entry (the test.sh flow):
tools/test_classification_model.py over the cifar resnet18 experiment's
test_config.py against a synthetic on-disk CIFAR-100 — the eval twin of
the train-entry e2e in test_engine_classification."""

import os
import pickle
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def cifar_fixture(tmp_path, monkeypatch):
    root = tmp_path / "datasets" / "CIFAR100" / "cifar-100-python"
    root.mkdir(parents=True)
    rs = np.random.RandomState(0)
    for name, n in (("train", 256), ("test", 128)):
        d = {b"data": rs.randint(0, 256, (n, 3072), dtype=np.uint8),
             b"fine_labels": rs.randint(0, 100, (n,)).tolist()}
        with open(root / name, "wb") as f:
            pickle.dump(d, f)
    monkeypatch.setenv("SIMPLEAICV_DATA_ROOT", str(tmp_path / "datasets"))
    return tmp_path


def test_classification_test_entry_e2e(cifar_fixture, tmp_path,
                                       monkeypatch):
    import shutil

    exp_src = os.path.join(
        REPO, "00.classification_training", "cifar100", "resnet18cifar")
    work = tmp_path / "exp"
    work.mkdir()
    shutil.copy(os.path.join(exp_src, "train_config.py"),
                work / "train_config.py")
    shutil.copy(os.path.join(exp_src, "test_config.py"),
                work / "test_config.py")
    # shrink the eval batch so 128 synthetic samples shard on 8 devices
    s = (work / "train_config.py").read_text()
    s = s.replace("batch_size = 128", "batch_size = 64")
    (work / "train_config.py").write_text(s)

    sys.path.insert(0, os.path.join(REPO, "tools"))
    monkeypatch.syspath_prepend(str(work))
    try:
        from test_classification_model import main as test_main
        import importlib
        # the entry imports test_config by work-dir path itself
        sys.argv = ["test_classification_model", "--work-dir", str(work)]
        acc = test_main()
    finally:
        sys.path.remove(os.path.join(REPO, "tools"))
    # random init on random labels: top1 near chance but a valid number
    assert acc is None or 0.0 <= float(acc) <= 100.0
    log = (work / "log").exists()
    assert log
