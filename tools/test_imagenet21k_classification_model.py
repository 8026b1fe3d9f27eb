"""ImageNet-21K classification eval entry (parity with
/root/reference/tools/test_imagenet21k_classification_model.py:
semantic-softmax top-1 over the hierarchy levels collapses to plain top-1
on the flat 21k label space for eval)."""

import argparse

from _test_common import run_test


def main():
    parser = argparse.ArgumentParser(
        description="test imagenet21k classification model")
    parser.add_argument("--work-dir", type=str, required=True)
    args = parser.parse_args()

    from simpleaicv_pytorch_training_examples_tpu.engine.evaluators import (
        classification_evaluator)
    return run_test(args.work_dir, classification_evaluator)


if __name__ == "__main__":
    main()
