"""Face parsing eval entry (parity with /root/reference/tools/test_human_parsing_model.py)."""

import argparse

from _test_common import run_test


def main():
    parser = argparse.ArgumentParser(description="test human parsing model")
    parser.add_argument("--work-dir", type=str, required=True)
    args = parser.parse_args()
    from simpleaicv_pytorch_training_examples_tpu.engine.evaluators import (
        semantic_segmentation_evaluator)
    return run_test(args.work_dir, semantic_segmentation_evaluator)


if __name__ == "__main__":
    main()
