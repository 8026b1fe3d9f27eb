"""Human matting eval entry (parity with /root/reference/tools/test_human_matting_model.py)."""

import argparse

from _test_common import run_test
from train_human_matting_model import build_eval


def main():
    parser = argparse.ArgumentParser(description="test human matting model")
    parser.add_argument("--work-dir", type=str, required=True)
    args = parser.parse_args()
    return run_test(args.work_dir, build_eval)


if __name__ == "__main__":
    main()
