"""SA-V preprocessing: decode videos to sampled frame JPEGs, convert
masklet RLE annotations to per-frame mask PNGs, and filter clips whose
tracked object vanishes (no-object) or is a contained part of a larger
masklet.

Consolidates /root/reference/SimpleAICV/video_interactive_segmentation/
video_interactive_segmentation_dataset_preprocessing/
{001.convert_sa_v_dataset,002.resave_sa_v_dataset_image_json,
003.filter_sa_v_dataset_no_object,004.filter_sa_v_dataset_part_object,
005.convert_sa_v_dataset_val_test,006...}.py into one entry with --stage;
val/test splits use the same pipeline with --annot-key.

Output layout matches this framework's SAM2VideoSegmentationDataset /
SAM2VideoMattingDataset: <out>/<video_id>/00000.jpg + 00000_mask.png.
"""

import argparse
import json
import os
import sys
from multiprocessing import Pool

import numpy as np

BASE_DIR = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
sys.path.append(BASE_DIR)

from simpleaicv_pytorch_training_examples_tpu.detection.rle import (  # noqa: E402
    coco_rle_to_mask)


def decode_video(video_path, sample_rate=1):
    import cv2
    video = cv2.VideoCapture(video_path)
    frames = []
    idx = 0
    while video.isOpened():
        ret, frame = video.read()
        if not ret:
            break
        if idx % sample_rate == 0:
            frames.append(frame)
        idx += 1
    video.release()
    return frames


def convert_one(args):
    video_path, annot_path, out_root, sample_rate, annot_key, min_area = \
        args
    import cv2
    video_id = os.path.splitext(os.path.basename(video_path))[0]
    frames = decode_video(video_path, sample_rate)
    if not frames:
        return 0
    with open(annot_path, encoding="utf-8") as f:
        annot = json.load(f)
    # masklets: [object][frame] RLE (auto or manual annot key)
    masklets = annot.get(annot_key) or annot.get("masklet") or []
    n_written = 0
    for obj_idx, masklet in enumerate(masklets):
        masklet = masklet[::sample_rate]
        # no-object filter: the track must be non-empty in every frame
        masks = []
        ok = True
        for rle in masklet[:len(frames)]:
            if rle is None:
                ok = False
                break
            m = coco_rle_to_mask(rle)
            if m.sum() < min_area:
                ok = False
                break
            masks.append(m)
        if not ok or len(masks) < len(frames):
            continue
        out_dir = os.path.join(out_root, f"{video_id}_obj{obj_idx}")
        os.makedirs(out_dir, exist_ok=True)
        for fid, (frame, m) in enumerate(zip(frames, masks)):
            cv2.imwrite(os.path.join(out_dir, f"{fid:05d}.jpg"), frame)
            cv2.imwrite(os.path.join(out_dir, f"{fid:05d}_mask.png"),
                        (m * 255).astype(np.uint8))
        n_written += 1
    return n_written


def filter_part_objects(out_root, contain_recall=0.9):
    """Drop tracks whose frame-0 mask is mostly inside another track's
    frame-0 mask of the same source video (reference 004)."""
    import cv2
    by_video = {}
    for d in sorted(os.listdir(out_root)):
        src = d.rsplit("_obj", 1)[0]
        by_video.setdefault(src, []).append(d)
    n_drop = 0
    for src, tracks in by_video.items():
        masks = {}
        for t in tracks:
            p = os.path.join(out_root, t, "00000_mask.png")
            if os.path.exists(p):
                masks[t] = cv2.imread(p, cv2.IMREAD_GRAYSCALE) > 127
        order = sorted(masks, key=lambda t: -masks[t].sum())
        kept = []
        for t in order:
            mt = masks[t]
            at = mt.sum()
            contained = any(
                at and np.logical_and(mt, masks[k]).sum() / at >
                contain_recall for k in kept)
            if contained:
                import shutil
                shutil.rmtree(os.path.join(out_root, t))
                n_drop += 1
            else:
                kept.append(t)
    return n_drop


def main():
    p = argparse.ArgumentParser(description="SA-V preprocessing")
    p.add_argument("--stage", choices=("convert", "filter_part"),
                   required=True)
    p.add_argument("--input-dir", required=True,
                   help="dir of <id>.mp4 + <id>_auto.json / _manual.json")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--sample-rate", type=int, default=4)
    p.add_argument("--annot-key", default="masklet",
                   help="json key holding masklets (auto/manual splits)")
    p.add_argument("--annot-suffix", default="_manual.json")
    p.add_argument("--min-area", type=int, default=100)
    p.add_argument("--contain-recall", type=float, default=0.9)
    p.add_argument("--workers", type=int, default=8)
    args = p.parse_args()

    os.makedirs(args.output_dir, exist_ok=True)
    if args.stage == "filter_part":
        n = filter_part_objects(args.output_dir, args.contain_recall)
        print(f"filter_part: removed {n} tracks")
        return

    work = []
    for name in sorted(os.listdir(args.input_dir)):
        if not name.endswith(".mp4"):
            continue
        stem = name[:-4]
        annot = os.path.join(args.input_dir, stem + args.annot_suffix)
        if os.path.exists(annot):
            work.append((os.path.join(args.input_dir, name), annot,
                         args.output_dir, args.sample_rate, args.annot_key,
                         args.min_area))
    with Pool(args.workers) as pool:
        counts = pool.map(convert_one, work)
    print(f"convert: {len(work)} videos, {int(np.sum(counts))} tracks")


if __name__ == "__main__":
    main()
