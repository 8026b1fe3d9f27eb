"""Instance segmentation eval entry (parity with /root/reference/tools/test_instance_segmentation_model.py)."""

import argparse

from _test_common import run_test
from train_instance_segmentation_model import build_eval


def main():
    parser = argparse.ArgumentParser(
        description="test instance segmentation model")
    parser.add_argument("--work-dir", type=str, required=True)
    args = parser.parse_args()
    return run_test(args.work_dir, build_eval)


if __name__ == "__main__":
    main()
