"""Universal segmentation eval on a face-parsing dataset (parity with
/root/reference/tools/
test_universal_segmentation_model_for_face_parsing_dataset.py)."""

import argparse

from _test_common import run_test
from universal_segmentation_test_common import semantic_eval


def main():
    parser = argparse.ArgumentParser(
        description="test universal segmentation model "
                    "(face parsing dataset)")
    parser.add_argument("--work-dir", type=str, required=True)
    args = parser.parse_args()
    return run_test(args.work_dir, semantic_eval)


if __name__ == "__main__":
    main()
