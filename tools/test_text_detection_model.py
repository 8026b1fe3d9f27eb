"""Text detection eval entry (parity with /root/reference/tools/
test_text_detection_model.py: DetEval precision/recall/hmean, optionally
over a val_dataset_list)."""

import argparse

from _test_common import run_test
from train_text_detection_model import build_eval


def main():
    parser = argparse.ArgumentParser(description="test text detection model")
    parser.add_argument("--work-dir", type=str, required=True)
    args = parser.parse_args()

    from simpleaicv_pytorch_training_examples_tpu.utils import (
        load_config_from_work_dir)
    config = load_config_from_work_dir(args.work_dir, "test_config")
    datasets = getattr(config, "val_dataset_list", None)
    if datasets is None:
        return run_test(args.work_dir, build_eval)
    results = []
    for ds in datasets:
        config.test_dataset = ds
        results.append(run_test(args.work_dir, build_eval))
    return results


if __name__ == "__main__":
    main()
