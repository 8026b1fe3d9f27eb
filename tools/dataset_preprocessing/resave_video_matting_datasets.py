"""Resave video-matting sources (VideoMatte240K-style fgr/pha frame dirs
or videos, V-HIM-style per-clip dirs) and background video clips into the
layouts SAM2VideoMattingDataset composites from.

Consolidates /root/reference/SimpleAICV/video_interactive_segmentation/
video_interactive_segmentation_dataset_preprocessing/
{010.resave_videomatte240k_dataset_image_mask,
011.resave_background_video_dataset_image,
012.resave_v-him2k5_dataset_image_mask,
013.resave_v-him60_dataset_image_mask}.py into one entry with --stage.

Output layouts (what the dataset reads, sam2_video_matting_dataset.py):
- foreground sets:  <out>/<video_id>/00000.jpg + 00000_alpha.png per frame
- background clips: <out>/<video_id>/00000.jpg per frame (no mattes)

Stages:
- ``matting``: pair foreground frames with alpha frames by sorted stem
  from --fgr-dir/<video>/ and --pha-dir/<video>/ (VideoMatte240K layout)
  or a single --fgr-dir/<video>/ holding both `*.jpg` + `*_alpha.png`
  (V-HIM layout); resample to --frame-stride, cap at --max-frames, drop
  frames whose alpha has fewer than --min-fg-pixels foreground pixels at
  the clip edges (the reference trims empty lead-in/lead-out).
- ``background``: decode --videos-dir/*.mp4 (or copy frame dirs) at
  --frame-stride into background clips, resized to --max-side.

Usage:
  python resave_video_matting_datasets.py --stage matting \
      --fgr-dir VideoMatte240K/fgr --pha-dir VideoMatte240K/pha \
      --output-dir out/videomatte240k/train [--frame-stride 2]
  python resave_video_matting_datasets.py --stage background \
      --videos-dir backgrounds/ --output-dir out/background_videos/train
"""

import argparse
import os

import numpy as np


def _list_frames(d, suffixes=(".jpg", ".jpeg", ".png")):
    return sorted(f for f in os.listdir(d)
                  if f.lower().endswith(suffixes) and "_alpha" not in f)


def _resize_max_side(image, max_side):
    import cv2
    h, w = image.shape[:2]
    scale = min(1.0, max_side / max(h, w))
    if scale < 1.0:
        image = cv2.resize(image, (round(w * scale), round(h * scale)))
    return image


def resave_matting(args):
    import cv2
    os.makedirs(args.output_dir, exist_ok=True)
    n_clips = 0
    for video in sorted(os.listdir(args.fgr_dir)):
        fgr_dir = os.path.join(args.fgr_dir, video)
        if not os.path.isdir(fgr_dir):
            continue
        pha_dir = os.path.join(args.pha_dir, video) if args.pha_dir \
            else fgr_dir
        frames = _list_frames(fgr_dir)[::args.frame_stride]
        if args.max_frames:
            frames = frames[:args.max_frames]
        pairs = []
        for name in frames:
            stem = os.path.splitext(name)[0]
            if args.pha_dir:
                alpha_path = None
                for ext in (".png", ".jpg"):
                    cand = os.path.join(pha_dir, stem + ext)
                    if os.path.exists(cand):
                        alpha_path = cand
                        break
            else:
                cand = os.path.join(fgr_dir, stem + "_alpha.png")
                alpha_path = cand if os.path.exists(cand) else None
            if alpha_path is None:
                continue
            pairs.append((os.path.join(fgr_dir, name), alpha_path))
        # trim empty lead-in / lead-out (reference keeps the tracked
        # object visible across the clip)
        def fg_pixels(p):
            a = cv2.imread(p[1], cv2.IMREAD_GRAYSCALE)
            return 0 if a is None else int(np.count_nonzero(a > 12))
        while pairs and fg_pixels(pairs[0]) < args.min_fg_pixels:
            pairs.pop(0)
        while pairs and fg_pixels(pairs[-1]) < args.min_fg_pixels:
            pairs.pop()
        if len(pairs) < args.min_frames:
            continue
        out = os.path.join(args.output_dir, video)
        os.makedirs(out, exist_ok=True)
        for t, (img_path, alpha_path) in enumerate(pairs):
            image = cv2.imread(img_path, cv2.IMREAD_COLOR)
            alpha = cv2.imread(alpha_path, cv2.IMREAD_GRAYSCALE)
            if image is None or alpha is None:
                continue
            image = _resize_max_side(image, args.max_side)
            alpha = cv2.resize(alpha, (image.shape[1], image.shape[0]),
                               interpolation=cv2.INTER_LINEAR)
            cv2.imwrite(os.path.join(out, f"{t:05d}.jpg"), image)
            cv2.imwrite(os.path.join(out, f"{t:05d}_alpha.png"), alpha)
        n_clips += 1
    print(f"wrote {n_clips} matting clips -> {args.output_dir}")


def resave_background(args):
    import cv2
    os.makedirs(args.output_dir, exist_ok=True)
    n_clips = 0
    for entry in sorted(os.listdir(args.videos_dir)):
        src = os.path.join(args.videos_dir, entry)
        stem = os.path.splitext(entry)[0]
        out = os.path.join(args.output_dir, stem)
        frames = []
        if os.path.isdir(src):
            for name in _list_frames(src)[::args.frame_stride]:
                frames.append(cv2.imread(os.path.join(src, name),
                                         cv2.IMREAD_COLOR))
        elif entry.lower().endswith((".mp4", ".avi", ".mov", ".webm")):
            cap = cv2.VideoCapture(src)
            t = 0
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                if t % args.frame_stride == 0:
                    frames.append(frame)
                t += 1
                if args.max_frames and len(frames) >= args.max_frames:
                    break
            cap.release()
        else:
            continue
        frames = [f for f in frames if f is not None]
        if args.max_frames:
            frames = frames[:args.max_frames]
        if len(frames) < args.min_frames:
            continue
        os.makedirs(out, exist_ok=True)
        for t, frame in enumerate(frames):
            cv2.imwrite(os.path.join(out, f"{t:05d}.jpg"),
                        _resize_max_side(frame, args.max_side))
        n_clips += 1
    print(f"wrote {n_clips} background clips -> {args.output_dir}")


def main():
    p = argparse.ArgumentParser(
        description="resave video matting / background video datasets")
    p.add_argument("--stage", choices=["matting", "background"],
                   required=True)
    p.add_argument("--fgr-dir", help="foreground frame dirs (per video)")
    p.add_argument("--pha-dir", default="",
                   help="alpha frame dirs; empty = alphas beside frames")
    p.add_argument("--videos-dir", help="background videos or frame dirs")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--frame-stride", type=int, default=1)
    p.add_argument("--max-frames", type=int, default=0)
    p.add_argument("--min-frames", type=int, default=2)
    p.add_argument("--min-fg-pixels", type=int, default=100)
    p.add_argument("--max-side", type=float, default=1080.0)
    args = p.parse_args()
    if args.stage == "matting":
        assert args.fgr_dir, "--fgr-dir required for --stage matting"
        resave_matting(args)
    else:
        assert args.videos_dir, "--videos-dir required for --stage background"
        resave_background(args)


if __name__ == "__main__":
    main()
