"""salient_object_detection eval entry (parity with /root/reference/tools/test_salient_object_detection_model.py)."""

import argparse

from _test_common import run_test


def main():
    parser = argparse.ArgumentParser(description="test salient_object_detection model")
    parser.add_argument("--work-dir", type=str, required=True)
    args = parser.parse_args()
    from simpleaicv_pytorch_training_examples_tpu.engine.evaluators import (
        salient_object_detection_evaluator)
    return run_test(args.work_dir, salient_object_detection_evaluator)


if __name__ == "__main__":
    main()
