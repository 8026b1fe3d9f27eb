"""Objects365 detection training entry (parity with
/root/reference/tools/train_objects365_detection_model.py — same loop as
COCO detection with the Objects365 dataset/classes in the config)."""

from train_detection_model import main

if __name__ == "__main__":
    main()
