"""Convert VOS datasets (DAVIS / YouTube-VOS / MOSE layout) into the
framework's frame-track layout (<out>/<video>_obj<k>/00000.jpg +
00000_mask.png per frame, one directory per tracked object).

Parity with the reference's per-dataset SA-V/MOSE/DAVIS/YouTubeVOS
preprocessing scripts (/root/reference/SimpleAICV/
video_interactive_segmentation/video_interactive_segmentation_dataset_
preprocessing/): those datasets ship JPEGImages/<video>/NNNNN.jpg +
Annotations/<video>/NNNNN.png with object ids encoded in the palette
values; each object id becomes one binary track, tracks whose object
vanishes mid-clip are dropped (the reference's no-object filter).

Usage:
  python vos_datasets.py --images JPEGImages --annots Annotations \
      --output-dir out [--sample-rate 1] [--min-area 100]
"""

import argparse
import os

import numpy as np


def main():
    import cv2
    p = argparse.ArgumentParser(description="convert VOS datasets")
    p.add_argument("--images", required=True)
    p.add_argument("--annots", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--sample-rate", type=int, default=1)
    p.add_argument("--min-area", type=int, default=100)
    p.add_argument("--allow-missing-frames", action="store_true",
                   help="keep tracks annotated on a frame subset "
                        "(YouTube-VOS style sparse annotations)")
    args = p.parse_args()

    os.makedirs(args.output_dir, exist_ok=True)
    n_tracks = 0
    for video in sorted(os.listdir(args.images)):
        vdir = os.path.join(args.images, video)
        adir = os.path.join(args.annots, video)
        if not os.path.isdir(vdir) or not os.path.isdir(adir):
            continue
        frames = sorted(n for n in os.listdir(vdir)
                        if n.lower().endswith(".jpg"))
        frames = frames[::args.sample_rate]
        if not frames:
            continue
        # collect object ids present in the first annotated frame
        masks = {}
        for name in frames:
            ap = os.path.join(adir, name.rsplit(".", 1)[0] + ".png")
            if os.path.exists(ap):
                masks[name] = cv2.imread(ap, cv2.IMREAD_GRAYSCALE)
        if not masks:
            continue
        first = masks[sorted(masks)[0]]
        obj_ids = [int(v) for v in np.unique(first) if v != 0]
        for obj in obj_ids:
            ok = True
            track = []
            for name in frames:
                m = masks.get(name)
                if m is None:
                    if args.allow_missing_frames:
                        continue
                    ok = False
                    break
                binary = (m == obj).astype(np.uint8)
                if binary.sum() < args.min_area:
                    ok = False  # object vanished: drop the track
                    break
                track.append((name, binary))
            if not ok or not track:
                continue
            out_dir = os.path.join(args.output_dir, f"{video}_obj{obj}")
            os.makedirs(out_dir, exist_ok=True)
            for fid, (name, binary) in enumerate(track):
                img = cv2.imread(os.path.join(vdir, name))
                cv2.imwrite(os.path.join(out_dir, f"{fid:05d}.jpg"), img)
                cv2.imwrite(os.path.join(out_dir, f"{fid:05d}_mask.png"),
                            binary * 255)
            n_tracks += 1
    print(f"converted {n_tracks} object tracks")


if __name__ == "__main__":
    main()
