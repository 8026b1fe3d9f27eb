"""Universal segmentation eval on a salient-object-detection dataset
(parity with /root/reference/tools/
test_universal_segmentation_model_for_salient_object_detection_dataset.py).
"""

import argparse

from _test_common import run_test
from universal_segmentation_test_common import binary_eval


def main():
    parser = argparse.ArgumentParser(
        description="test universal segmentation model "
                    "(salient object detection dataset)")
    parser.add_argument("--work-dir", type=str, required=True)
    args = parser.parse_args()
    return run_test(args.work_dir, binary_eval)


if __name__ == "__main__":
    main()
