"""Universal segmentation eval on a human-matting dataset (parity with
/root/reference/tools/
test_universal_segmentation_model_for_human_matting_dataset.py)."""

import argparse
import functools

from _test_common import run_test
from universal_segmentation_test_common import binary_eval


def main():
    parser = argparse.ArgumentParser(
        description="test universal segmentation model "
                    "(human matting dataset)")
    parser.add_argument("--work-dir", type=str, required=True)
    args = parser.parse_args()
    return run_test(args.work_dir,
                    functools.partial(binary_eval, matting=True))


if __name__ == "__main__":
    main()
